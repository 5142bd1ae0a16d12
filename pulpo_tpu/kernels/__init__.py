"""Pallas TPU kernels with XLA fallbacks.

Every kernel here has (a) an interpret-mode path exercised by the CPU
test suite, (b) an XLA fallback selected when Pallas is disabled or the
backend is not TPU, and (c) a custom VJP where autodiff through
pallas_call is needed.
"""

import os

import jax

def pallas_available() -> bool:
    """Per-process Pallas master switch (config.use_pallas gates
    per-model; PULPO_USE_PALLAS / config routing gate per-process)."""
    from pulpo_tpu import routing

    return routing.get("PULPO_USE_PALLAS") == "1" and \
        jax.default_backend() == "tpu"


from pulpo_tpu.kernels.box_sum import box_sum_nd  # noqa: E402,F401
