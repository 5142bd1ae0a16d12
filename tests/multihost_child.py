"""Child process for the real 2-process multihost test.

Run by tests/test_parallel.py::test_multihost_two_process via subprocess:

    python tests/multihost_child.py <pid> <coordinator> <outdir>

Each of the two processes drives 4 virtual CPU devices (XLA_FLAGS set by
the parent), joins the jax.distributed runtime, and writes its view of
the sharded dataset indices plus a DP gradient computed over the
globally-sharded batch to <outdir>. The parent asserts cross-process
disjointness/coverage (incl. the tail-drop case) and gradient equality
vs a single-process numpy reference — converting parallel/multihost.py
from scaffolding into a verified subsystem (reference has no analog;
this matches the SPMD contract of jax.distributed docs).
"""
import os
import sys

pid = int(sys.argv[1])
coordinator = sys.argv[2]
outdir = sys.argv[3]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# must run before any backend use
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=2, process_id=pid)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pulpo_tpu.parallel import multihost as mh

assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid, (jax.process_index(), pid)
assert len(jax.local_devices()) == 4, jax.local_devices()
assert jax.device_count() == 8, jax.device_count()

mesh = mh.make_global_mesh()
assert mesh.devices.shape == (8,)

# --- dataset index sharding: tail-drop case (37 % 8 = 5 dropped) ---
idx = mh.shard_dataset_indices(37, seed=11, epoch=2, global_batch=8)
np.save(os.path.join(outdir, f"idx{pid}.npy"), idx)

# --- one DP "step": gradient of a global-batch loss over the sharded
# batch must equal the single-process full-batch gradient ---
sl = mh.process_shard(8)
rng = np.random.default_rng(5)
full_x = rng.standard_normal((8, 3)).astype(np.float32)
full_y = rng.standard_normal((8,)).astype(np.float32)
local = {"x": full_x[sl], "y": full_y[sl]}
gbatch = mh.local_to_global(local, mesh, P("data"))
assert gbatch["x"].shape == (8, 3), gbatch["x"].shape

w = jnp.asarray(np.linspace(-1.0, 1.0, 3, dtype=np.float32))


def loss(w, batch):
    pred = batch["x"] @ w
    return jnp.mean((pred - batch["y"]) ** 2)


rep = NamedSharding(mesh, P())
grad = jax.jit(jax.grad(loss), out_shardings=rep)(w, gbatch)
np.save(os.path.join(outdir, f"grad{pid}.npy"),
        np.asarray(jax.device_get(grad)))

# replicated-output fetch of the loss itself (exercises the cross-process
# collective the mean implies)
val = float(jax.device_get(jax.jit(loss, out_shardings=rep)(w, gbatch)))
with open(os.path.join(outdir, f"loss{pid}.txt"), "w") as f:
    f.write(repr(val))

jax.distributed.shutdown()
print(f"child {pid} ok", flush=True)
