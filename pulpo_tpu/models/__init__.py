from pulpo_tpu.models.pulpo import (  # noqa: F401
    PULPoModule,
    DownPath,
    Autoencoder,
    PULPoEncoder,
    SVFDecoder,
    prior_like,
)
from pulpo_tpu.models.api import PULPoModel  # noqa: F401
