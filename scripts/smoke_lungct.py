"""LungCT end-to-end smoke (VERDICT r4 missing #2 / next #9, BASELINE
milestone 3): generate a small synthetic LungCT.h5 with a
respiratory-regime deformation (large SI displacement), run the real
`train_cli --dataset lungct` for a few steps, run
`Evaluator(task="lungct")` performance tables, and demonstrate at
runtime that the large-displacement coarse warp tier is the branch the
cascade actually takes on this data (reference analog: the
task/dataset switch of evaluate.py:149-159 + train.py:55-76).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/smoke_lungct.py            # real TPU
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, "/root/repo")

import h5py
import numpy as np

H5 = "/tmp/LungCT_smoke.h5"
SHAPE = (48, 64, 64)
N = 3


def make_h5():
    """Synthetic inhale/exhale pairs: band-limited lung-ish volumes;
    exhale = inhale displaced by a respiratory-like SI ramp (up to ~6
    voxels at this 48-slice scale — proportionally the 16-voxel ramp of
    the full-res regime) + small in-plane drift."""
    rng = np.random.default_rng(0)
    with h5py.File(H5, "w") as f:
        f.attrs["shape"] = SHAPE
        for split in ("training", "validation", "test"):
            g = f.create_group(split)
            g.attrs["N"] = N
            gi = g.create_group("inhale")
            ge = g.create_group("exhale")
            gi.create_group("image")
            ge.create_group("image")
            gi.create_group("landmarks")
            ge.create_group("landmarks")
            for i in range(N):
                base = rng.random((12, 16, 16)).astype(np.float32)
                from scipy import ndimage  # in the torch image

                vol = ndimage.zoom(base, (4, 4, 4), order=3)
                vol = (vol - vol.min()) / (np.ptp(vol) + 1e-6)
                # SI ramp: z displacement grows toward the diaphragm
                z = np.arange(SHAPE[0], dtype=np.float32)
                dz = 6.0 * (z / (SHAPE[0] - 1)) ** 2
                exhale = np.empty_like(vol)
                for zi in range(SHAPE[0]):
                    src = min(SHAPE[0] - 1, zi + dz[zi])
                    lo = int(np.floor(src))
                    hi = min(lo + 1, SHAPE[0] - 1)
                    w = src - lo
                    exhale[zi] = (1 - w) * vol[lo] + w * vol[hi]
                gi["image"][str(i)] = vol
                ge["image"][str(i)] = exhale
                lm = rng.uniform([4, 4, 4], [s - 4 for s in SHAPE],
                                 (8, 3)).astype(np.float32)
                gi["landmarks"][str(i)] = lm
                ge["landmarks"][str(i)] = lm + np.stack(
                    [6.0 * (lm[:, 0] / (SHAPE[0] - 1)) ** 2,
                     np.zeros(8), np.zeros(8)], 1)
    print(f"# wrote {H5}", flush=True)


def main():
    make_h5()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # 1) the real CLI, a few steps, tiny model
    from pulpo_tpu import train_cli

    run_dir = "/tmp/lungct_smoke_runs"
    argv = ["--dataset", "lungct", "--data_path", H5,
            "--total_levels", "3", "--latent_levels", "2", "--n0", "4",
            "--batch_size", "1", "--max_steps", "8", "--max_epochs", "4",
            "--df_resolution", "full_res", "--run_dir", run_dir,
            "--skip_eval"]
    t0 = time.time()
    train_cli.main(argv)
    print(f"TRAIN_CLI_OK ({time.time()-t0:.0f}s)", flush=True)

    # routing proof: the lungct path enabled the coarse tier via config
    from pulpo_tpu import routing

    assert routing.get("PULPO_WARP_COARSE") == "1", routing.resolved_table()
    print("ROUTING_COARSE_ON", flush=True)

    # 2) evaluator tables on the trained run
    from pulpo_tpu.eval.evaluator import Evaluate
    from pulpo_tpu.train.checkpoint import latest_run

    rd = latest_run(run_dir)
    ev = Evaluate(checkpoint_name="latest")
    ev.load_model(rd)
    ev.load_data("lungct", segs=False, lms=True, mask=False, path=H5)
    t0 = time.time()
    df_perf = ev.performance()
    print(df_perf.to_string()[:500], flush=True)
    print(f"EVAL_TABLES_OK ({time.time()-t0:.0f}s) -> {ev.output_dir}",
          flush=True)

    # 3) branch evidence: on THIS data's actual deformation regime,
    # which cascade branch runs? Recompute the cascade's own branch
    # selection for the ground-truth-scale field (the 6-voxel SI ramp):
    # every plain tier must overflow its repair budget (-> without the
    # coarse tier the warp would take the exact-but-40x-slower gather)
    # while the coarse tier's residual bad fraction is ~0.
    import jax.numpy as jnp

    from pulpo_tpu.kernels.warp_halo import (
        coarse_bad_mask,
        coarse_offsets,
        halo_bad_mask,
        repair_budgets,
    )

    z = jnp.arange(SHAPE[0], dtype=jnp.float32)
    dz = 6.0 * (z / (SHAPE[0] - 1)) ** 2
    df = jnp.zeros((1, *SHAPE, 3)).at[..., 0].set(
        dz[None, :, None, None] + 0.3)
    ks = repair_budgets(df)
    h = 3
    n_bad = int(jax.device_get(jnp.sum(halo_bad_mask(df, h))))
    frac = n_bad / df[..., 0].size
    bz = 1
    cz, cyx = coarse_offsets(df, 1, bz)
    bad_c = coarse_bad_mask(df, h, cz, cyx, 1, bz)
    n_bad_c = int(jax.device_get(jnp.sum(bad_c)))
    print(f"TIER_EVIDENCE H={h}: plain-tier bad voxels {n_bad} "
          f"(frac {frac:.3f}, repair budgets {ks}) -> beyond repair; "
          f"coarse-tier residual bad {n_bad_c} -> coarse branch RUNS",
          flush=True)
    assert n_bad > max(ks) and n_bad_c < min(ks)
    print("SMOKE_LUNGCT_DONE", flush=True)


if __name__ == "__main__":
    main()
