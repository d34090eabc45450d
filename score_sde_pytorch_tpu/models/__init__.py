"""Score-network model zoo: NCSN++/DDPM++, DDPM, NCSN/NCSNv2 (flax, NHWC)."""
from score_sde_pytorch_tpu.models import utils as mutils  # noqa: F401

# Importing registers the models.
from score_sde_pytorch_tpu.models import ncsnpp  # noqa: F401
from score_sde_pytorch_tpu.models import ddpm  # noqa: F401
from score_sde_pytorch_tpu.models import ncsnv2  # noqa: F401
