"""Pallas TPU kernels with XLA fallbacks.

Every kernel here has (a) an interpret-mode path exercised by the CPU
test suite, (b) an XLA fallback selected when Pallas is disabled or the
backend is not TPU, and (c) a custom VJP where autodiff through
pallas_call is needed.
"""

import os

import jax

# Global switch (config.use_pallas gates per-model; this gates per-process)
USE_PALLAS = os.environ.get("PULPO_USE_PALLAS", "1") == "1"


def pallas_available() -> bool:
    return USE_PALLAS and jax.default_backend() == "tpu"


from pulpo_tpu.kernels.box_sum import box_sum_nd  # noqa: E402,F401
