"""Full-resolution deterministic parity vs the reference (torch CPU).

Builds the reference's own DownPath+Autoencoder (from /root/reference)
at the OASIS full-size config (160x192x224, 5 levels / 4 latent, n0=32),
ports the state_dict into pulpo_tpu, and compares every per-level output
of a deterministic forward on one synthetic volume pair. This derisks
the full-size config beyond the small-shape parity test
(tests/test_parity_model.py) — BASELINE.md "Parity harness".

Runs on CPU (both sides); takes tens of minutes on the 1-core host.
Usage:  python scripts/parity_fullres.py [--n0 32] [--size 160 192 224]
Writes a summary line per tensor and exits nonzero on tolerance failure.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n0", type=int, default=32)
    ap.add_argument("--size", type=int, nargs=3, default=[160, 192, 224])
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--latent", type=int, default=4)
    ap.add_argument("--rtol", type=float, default=1e-3)
    ap.add_argument("--atol", type=float, default=1e-4)
    args = ap.parse_args()

    import numpy as np
    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from pulpo_tpu.compat import import_torch_state_dict
    from pulpo_tpu.config import PULPoConfig
    from pulpo_tpu.models.api import PULPoModel

    sys.path.insert(0, REF)
    from src.components import pulpo as ref_pulpo

    cfg = PULPoConfig(
        input_size=tuple(args.size), total_levels=args.levels,
        latent_levels=args.latent, n0=args.n0, dataset="oasis",
    )
    torch.manual_seed(0)
    torch.set_num_threads(1)

    def mu_sampler(mu, sigma, var=1):  # RNG-free comparison (DIVERGENCES #2)
        return mu

    downpath = ref_pulpo.DownPath(
        total_levels=cfg.total_levels, latent_levels=cfg.latent_levels,
        input_size=list(cfg.input_size), input_channels=2, n0=cfg.n0)
    autoenc = ref_pulpo.Autoencoder(
        sampler=mu_sampler, decoder="SVF", total_levels=cfg.total_levels,
        latent_levels=cfg.latent_levels, zdim=cfg.ndims,
        input_size=list(cfg.input_size), feedback=list(cfg.feedback),
        df_resolution=cfg.df_resolution, n0=cfg.n0, cp_depth=cfg.cp_depth)

    ref = torch.nn.Module()
    ref.downpath, ref.autoencoder = downpath, autoenc
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.5)
    ref.eval()

    variables = import_torch_state_dict(ref.state_dict(), cfg)
    model = PULPoModel(cfg)

    rng = np.random.default_rng(0)
    x = rng.random((1, *cfg.input_size, 1), dtype=np.float32)
    y = rng.random((1, *cfg.input_size, 1), dtype=np.float32)

    def to_torch(a):
        nd = a.ndim - 2
        perm = (0, a.ndim - 1) + tuple(range(1, 1 + nd))
        return torch.from_numpy(np.transpose(a, perm).copy())

    def to_last(t):
        nd = t.ndim - 2
        perm = (0,) + tuple(range(2, 2 + nd)) + (1,)
        return np.transpose(t.detach().numpy(), perm)

    print(f"reference forward (torch CPU, {cfg.input_size}, n0={cfg.n0})...",
          flush=True)
    t0 = time.time()
    with torch.no_grad():
        acts = ref.downpath(to_torch(x), to_torch(y))
        r = ref.autoencoder(to_torch(x), acts, deterministic=True)
    print(f"  done in {time.time() - t0:.1f}s", flush=True)

    print("pulpo_tpu forward (jax CPU)...", flush=True)
    t0 = time.time()
    outs = jax.device_get(model.apply_eval(variables, x, y, deterministic=True))
    print(f"  done in {time.time() - t0:.1f}s", flush=True)

    names = ["mu", "sigma", "sample", "velocity_field", "individual_df",
             "combined_df", "final_df", "transformed"]
    failed = False
    for idx, name in enumerate(names):
        if idx == 2:  # samples == mu in deterministic mode
            continue
        for l in sorted(outs[idx]):
            a = np.asarray(outs[idx][l], np.float64)
            b = to_last(r[idx][l]).astype(np.float64)
            adiff = np.abs(a - b)
            denom = np.maximum(np.abs(b), 1e-30)
            print(f"{name:15s} level {l}: max_abs={adiff.max():.3e} "
                  f"mean_abs={adiff.mean():.3e} "
                  f"max_rel@|ref|>1e-3={np.max(np.where(np.abs(b) > 1e-3, adiff / denom, 0)):.3e}",
                  flush=True)
            ok = np.allclose(a, b, rtol=args.rtol, atol=args.atol)
            if not ok:
                failed = True
                print(f"  -> OUTSIDE rtol={args.rtol} atol={args.atol}")
    print("PARITY:", "FAIL" if failed else "PASS")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
