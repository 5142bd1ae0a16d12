"""PULPo-TPU: a TPU-native probabilistic deformable-registration framework.

A from-scratch JAX / XLA / Pallas implementation of the capabilities of
PULPo (Probabilistic Unsupervised Laplacian Pyramid Registration,
MICCAI 2024; reference implementation is PyTorch/Lightning). Everything
here is designed TPU-first:

- channels-last (B, [D,] H, W, C) layouts everywhere,
- separable linear resampling expressed as matmuls (MXU-friendly),
- scaling-and-squaring SVF integration under `jit`,
- on-chip vmapped posterior sampling for uncertainty quantification,
- data parallelism via `jax.sharding.Mesh` + `shard_map` with XLA
  collectives over ICI.

See SURVEY.md for the reference layer map this build targets.
"""

__version__ = "0.1.0"

from pulpo_tpu.config import PULPoConfig  # noqa: F401
