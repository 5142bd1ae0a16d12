"""FLOP recount from lowered HLO (VERDICT r2 weak #3).

The round-1/2 roofline hand counts (0.83 TFLOP/sample -> "7.1 pairs/s
ceiling") were falsified by the measured 10.66 pairs/s. This script gets
the compiler's own count via jax.stages.Lowered.cost_analysis() (XLA
HloCostAnalysis on the optimized-for-analysis HLO, no device compile
needed) for:

- the full UQ program at the bench operating points (B, chunk),
- the encode alone,
- a single-sample decode (per-sample marginal cost),
- the full-res training step.

Writes one line per program: name, flops, bytes accessed, and the
implied pairs/s at the v5e bf16 peak. Run on CPU (HLO cost analysis is
backend-agnostic for FLOP purposes).

Usage: python scripts/flops_recount.py [--size 160 192 224] [--b 2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

V5E_BF16_PEAK = 197e12  # TFLOP/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[160, 192, 224])
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--n0", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from pulpo_tpu.config import PULPoConfig
    from pulpo_tpu.models.api import PULPoModel
    from pulpo_tpu.models.pulpo import PULPoModule
    from pulpo_tpu.uq.predict import _uq_impl

    size = tuple(args.size)
    cfg = PULPoConfig(
        input_size=size, total_levels=5, latent_levels=4, n0=args.n0,
        compute_dtype="bfloat16", dataset="oasis",
    )
    model = PULPoModel(cfg, dtype=jnp.bfloat16)

    var_shapes = jax.eval_shape(lambda: model.init(jax.random.key(0)))
    x = jax.ShapeDtypeStruct((args.b, *size, 1), jnp.float32)
    rng = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)

    def report(name, lowered, pairs_per_prog):
        ca = lowered.cost_analysis()
        flops = ca.get("flops", float("nan"))
        bts = ca.get("bytes accessed", float("nan"))
        tf_per_pair = flops / max(pairs_per_prog, 1) / 1e12
        ceiling = V5E_BF16_PEAK / (flops / max(pairs_per_prog, 1))
        print(f"{name}: flops={flops:.3e} ({tf_per_pair:.2f} TFLOP/pair), "
              f"bytes={bts:.3e}, "
              f"100%-MXU ceiling={ceiling:.1f} pairs/s", flush=True)
        return flops

    # full UQ program (bench default operating point)
    def uq(v, xx, yy, r):
        res = _uq_impl(model, v, xx, yy, args.n, r, None, args.chunk)
        return res.mean_outputs[0], res.output_std[0], res.final_df_std[0]

    print(f"# size={size} B={args.b} N={args.n} chunk={args.chunk}", flush=True)
    lo = jax.jit(uq).lower(var_shapes, x, x, rng)
    f_uq = report(f"uq_N{args.n}_chunk{args.chunk}_B{args.b}", lo, args.b)

    # encode alone
    def enc(v, xx, yy):
        return model.module.apply(v, xx, yy, train=False,
                                  method=PULPoModule.encode)

    lo = jax.jit(enc).lower(var_shapes, x, x)
    f_enc = report(f"encode_B{args.b}", lo, args.b)

    # decode of one chunk (per-sample marginal)
    acts_shapes = jax.eval_shape(enc, var_shapes, x, x)
    keys = jax.ShapeDtypeStruct((args.chunk,), jax.random.key(0).dtype)

    def dec(v, xx, acts, ks):
        return model.module.apply(
            v, xx, acts, False, False, method=PULPoModule.decode,
            n_samples=args.chunk, sample_keys=ks)

    lo = jax.jit(dec).lower(var_shapes, x, acts_shapes, keys)
    f_dec = report(f"decode_chunk{args.chunk}_B{args.b}", lo, args.b)
    print(f"  -> per-sample decode: "
          f"{f_dec / (args.chunk * args.b) / 1e12:.3f} TFLOP", flush=True)

    # full-res training step
    from pulpo_tpu.train.step import create_train_state, make_train_step
    import optax

    state_shapes = jax.eval_shape(
        lambda: create_train_state(model, seed=0)[0])
    tx = optax.adam(cfg.lr)
    step = make_train_step(model, tx)
    batch = {"x": x, "y": x}
    lo = jax.jit(step).lower(state_shapes, batch)
    report(f"train_step_B{args.b}", lo, args.b)


if __name__ == "__main__":
    main()
