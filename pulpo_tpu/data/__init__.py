from pulpo_tpu.data.loader import DataLoader, prefetch_to_device  # noqa: F401
from pulpo_tpu.data import oasis, brats, synthetic  # noqa: F401
