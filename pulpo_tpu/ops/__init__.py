from pulpo_tpu.ops.resize import (  # noqa: F401
    resize_linear,
    avg_pool_ceil,
    avg_pool_pyramid,
)
from pulpo_tpu.ops.warp import (  # noqa: F401
    warp_image,
    integrate_svf,
    resize_vecfield,
    warp_landmarks,
)
from pulpo_tpu.ops import losses  # noqa: F401
