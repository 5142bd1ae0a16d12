"""Flagship eval pipeline end-to-end on the real TPU: run_one_model at
OASIS-size (160x192x224, 5 levels, n0=32) with N=32 posterior samples —
figures, jdet tables, performance and uncertainty tables (VERDICT r2
item 6: prove the eval pipeline on-chip, not just at tiny CPU configs).

Synthetic task (oasis-shaped volumes, segs+lms) so no OASIS.h5 needed.
Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/run_one_model_tpu.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.eval.evaluator import Evaluate
from pulpo_tpu.models.api import PULPoModel

t0 = time.perf_counter()
cfg = PULPoConfig(input_size=(160, 192, 224), total_levels=5,
                  latent_levels=4, n0=32, dataset="synthetic",
                  compute_dtype="bfloat16", segs=True)
model = PULPoModel(cfg, dtype=jnp.bfloat16)
variables = model.init(jax.random.key(0))
print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

ev = Evaluate()
ev.set_model(model, variables, output_dir="/tmp/eval_flagship")
t0 = time.perf_counter()
# the relay occasionally drops a compile mid-flight (bench.py retries
# the same classes of transient transport error); completed compiles
# stay in /tmp/jax_cache so a retry resumes where it died
for attempt in range(3):
    try:
        perf, unc = ev.run_one_model(segs=True, lms=True, N=32,
                                     task="synthetic", visualize=True)
        break
    except Exception as e:  # noqa: BLE001 - relay errors vary by layer
        transient = any(s in str(e) for s in (
            "Connection refused", "Connection Failed", "UNAVAILABLE",
            "transport", "crashed or restarted", "response body closed"))
        if not transient or attempt == 2:
            raise
        print(f"relay error (attempt {attempt + 1}), retrying in 120s: "
              f"{str(e)[:200]}", flush=True)
        time.sleep(120)
print(f"run_one_model {time.perf_counter() - t0:.1f}s", flush=True)
print("performance table:")
print(perf.to_string())
print("uncertainty table:")
print(unc.to_string())
assert np.isfinite(perf[("train", "RMSE")]).all()
assert np.isfinite(np.asarray(unc[("val", "NCC")], dtype=float)).all()
import pathlib

vis = list(pathlib.Path("/tmp/eval_flagship/vis").glob("*.png"))
print(f"figures: {len(vis)}", flush=True)
print("RUN_ONE_MODEL_TPU_OK", flush=True)
