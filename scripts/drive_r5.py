"""Round-5 verify drive (the .claude/skills/verify recipe): small
end-to-end train on the real TPU, prediction APIs, plus a hardware
check of the round-5 channels-first df pipeline at small scale.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/drive_r5.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu import PULPoConfig
from pulpo_tpu.data.loader import DataLoader, prefetch_to_device
from pulpo_tpu.data.synthetic import SyntheticDataset
from pulpo_tpu.models.api import PULPoModel
from pulpo_tpu.train.step import create_train_state, make_train_step


def main():
    cfg = PULPoConfig(input_size=(32, 32, 32), total_levels=4,
                      latent_levels=3, n0=8, dataset="synthetic",
                      batch_size=2)
    model = PULPoModel(cfg)
    state, tx = create_train_state(model, seed=0)
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    ds = SyntheticDataset(shape=cfg.input_size, n=6)
    dl = DataLoader(ds, batch_size=2, shuffle=True)

    t0 = time.time()
    losses = []
    for epoch in range(14):
        for batch in prefetch_to_device(iter(dl)):
            state, metrics = step(state, batch)
        losses.append(float(jax.device_get(metrics["total_loss"])))
        if epoch in (0, 13):
            print(f"# epoch {epoch} loss {losses[-1]:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert not bool(jax.device_get(state.nan_flag)), "nan_flag set"
    print(f"TRAIN_OK first {losses[0]:.4f} last {losses[-1]:.4f}", flush=True)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x = jnp.asarray(np.random.default_rng(0).random(
        (2, *cfg.input_size, 1), dtype=np.float32))
    y = jnp.asarray(np.random.default_rng(1).random(
        (2, *cfg.input_size, 1), dtype=np.float32))

    det1, _ = model.predict_deterministic(variables, x, y)
    det2, _ = model.predict_deterministic(variables, x, y)
    d01 = float(jax.device_get(
        jnp.max(jnp.abs(det1[0] - det2[0]))))
    assert d01 == 0.0, d01
    print("PREDICT_DET_OK (reproducible)", flush=True)

    outs, avg = model.predict(variables, x, y, 8, jax.random.key(5))
    for l, v in outs.items():
        assert bool(jax.device_get(jnp.all(jnp.isfinite(v)))), l
    print("PREDICT_N8_OK (finite)", flush=True)

    # round-5 CF pipeline on real hardware at small scale: same UQ
    # program with PULPO_CF_PIPELINE=1 must match the default path.
    # Own model at (48, 64, 64) so level-0 (24x32x32 = 24.6K voxels)
    # clears MIN_PALLAS_VOXELS and the layout-A chained squaring
    # kernel + CF cascade + CF resize ALL actually execute on hardware.
    from pulpo_tpu.uq.predict import _uq_impl

    cfg = PULPoConfig(input_size=(48, 64, 64), total_levels=3,
                      latent_levels=2, n0=4, dataset="synthetic",
                      batch_size=2)
    model = PULPoModel(cfg)
    variables = model.init(jax.random.key(11))
    x = jnp.asarray(np.random.default_rng(2).random(
        (2, *cfg.input_size, 1), dtype=np.float32))
    y = jnp.asarray(np.random.default_rng(3).random(
        (2, *cfg.input_size, 1), dtype=np.float32))
    rng = jax.random.key(7)
    base = jax.jit(lambda v, xx, yy: _uq_impl(model, v, xx, yy, 4, rng,
                                              None, 2))(variables, x, y)
    base_std = jax.device_get(base.output_std[0])
    base_fin = jax.device_get(base.final_df_std[0])
    os.environ["PULPO_CF_PIPELINE"] = "1"
    got = jax.jit(lambda v, xx, yy: _uq_impl(model, v, xx, yy, 4, rng,
                                             None, 2))(variables, x, y)
    got_std = jax.device_get(got.output_std[0])
    got_fin = jax.device_get(got.final_df_std[0])
    os.environ.pop("PULPO_CF_PIPELINE")
    d_std = float(np.max(np.abs(got_std - base_std)))
    d_fin = float(np.max(np.abs(got_fin - base_fin)))
    scale = float(np.max(np.abs(base_std))) or 1.0
    print(f"CF_UQ maxdiff output_std {d_std:.3e} final_df_std {d_fin:.3e} "
          f"(scale {scale:.3e})", flush=True)
    assert d_std <= 3e-5 * max(1.0, scale) and np.isfinite(got_std).all()
    print("CF_HW_OK", flush=True)
    print("DRIVE_R5_DONE", flush=True)


if __name__ == "__main__":
    main()
