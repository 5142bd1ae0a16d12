from pulpo_tpu.parallel.mesh import make_mesh, shard_batch_spec  # noqa: F401
from pulpo_tpu.parallel.dp import make_dp_train_step, replicate_state  # noqa: F401
