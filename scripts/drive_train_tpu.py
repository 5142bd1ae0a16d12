"""End-to-end training drive on the real TPU (the verify-skill recipe):
synthetic data, tiny config, train until the loss decreases, then the
prediction APIs. Exercises the full jitted train step INCLUDING the
Pallas squaring-step backward (default-on since round 3) and the
prediction/UQ paths.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/drive_train_tpu.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu.config import PULPoConfig
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

    t0 = time.perf_counter()
    losses = []
    for epoch in range(14):
        for batch in prefetch_to_device(iter(dl)):
            state, metrics = step(state, batch)
        losses.append(float(jax.device_get(metrics["total_loss"])))
        if epoch in (0, 13):
            print(f"epoch {epoch}: loss {losses[-1]:.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert not bool(jax.device_get(metrics["nan_flag"]))

    b = next(iter(DataLoader(ds, batch_size=2, shuffle=False)))
    x, y = jnp.asarray(b["x"]), jnp.asarray(b["y"])
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    outs1, dfs1 = model.predict_deterministic(variables, x, y)
    outs2, dfs2 = model.predict_deterministic(variables, x, y)
    d = float(jax.device_get(jnp.abs(outs1[0] - outs2[0]).max()))
    assert d == 0.0, f"deterministic predict not reproducible: {d}"
    outs, dfs = model.predict(variables, x, y, 8, jax.random.key(1))
    fin = float(jax.device_get(jnp.isfinite(outs[0]).all()))
    assert fin == 1.0
    print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f}; deterministic "
          f"reproducible; predict(N=8) finite. DRIVE_TRAIN_TPU_OK",
          flush=True)


if __name__ == "__main__":
    main()
