"""Dump the optimized HLO of one UQ decode chunk (flagship config) and
summarize op costs: where do the bytes/ops go after fusion?

AOT only (lower+compile, no execution) — still goes through the relay
compiler, so run it while the chip is otherwise idle.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_decode_hlo.py [out.txt]
"""
import collections
import re
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.models.api import PULPoModel
from pulpo_tpu.models.pulpo import PULPoModule

B, S = 2, 4


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decode_chunk.hlo"
    cfg = PULPoConfig(input_size=(160, 192, 224), total_levels=5,
                      latent_levels=4, n0=32, dataset="synthetic",
                      compute_dtype="bfloat16")
    model = PULPoModel(cfg, dtype=jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0)))

    x = jax.ShapeDtypeStruct((B, *cfg.input_size, 1), jnp.float32)
    acts = jax.eval_shape(
        lambda v, xx: model.module.apply(v, xx, xx, train=False,
                                         method=PULPoModule.encode),
        variables, x)
    keys = jax.ShapeDtypeStruct((S,), jax.random.key(0).dtype)

    def run(v, xx, a, ks):
        outs = model.module.apply(v, xx, a, False, False,
                                  method=PULPoModule.decode,
                                  n_samples=S, sample_keys=ks)
        return outs[7][0].astype(jnp.float32)

    t0 = time.perf_counter()
    compiled = jax.jit(run).lower(variables, x, acts, keys).compile()
    print(f"compile {time.perf_counter() - t0:.1f}s", flush=True)
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"HLO -> {out_path} ({len(txt) / 1e6:.1f} MB)")

    # summarize: op kinds and the largest-shape instructions
    kind_bytes = collections.Counter()
    big = []
    for line in txt.splitlines():
        m = re.search(r"= (\w+)\[([\d,]*)\]", line.replace("bf16", "f16"))
        m2 = re.search(r"%?(\S+) = (\w+)\[([0-9,]+)\]\{[^}]*\} (\w+)", line)
        if not m2:
            continue
        dtype, shape_s, op = m2.group(2), m2.group(3), m2.group(4)
        try:
            n = 1
            for d in shape_s.split(","):
                n *= int(d)
        except ValueError:
            continue
        bytes_ = n * (2 if dtype in ("bf16", "f16", "s16", "u16") else
                      1 if dtype in ("pred", "s8", "u8") else 4)
        kind_bytes[op] += bytes_
        if bytes_ >= 100e6:
            big.append((bytes_, op, dtype, shape_s, line.strip()[:160]))
    print("\noutput bytes by op kind (GB):")
    for op, b in kind_bytes.most_common(20):
        print(f"  {op:24s} {b / 1e9:8.2f}")
    print("\ninstructions with >=100MB outputs:")
    for b, op, dtype, shape_s, line in sorted(big, reverse=True)[:40]:
        print(f"  {b / 1e9:6.2f} GB {op:16s} {dtype}[{shape_s}]")

    ca = compiled.cost_analysis()
    if ca:
        print(f"\ncost_analysis: flops={ca.get('flops', 0):.3e} "
              f"bytes accessed={ca.get('bytes accessed', 0):.3e}")


if __name__ == "__main__":
    main()
