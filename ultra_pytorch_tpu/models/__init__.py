from ultra_pytorch_tpu.models.base import (  # noqa: F401
    BaseRanker,
    ACTIVATIONS,
    sample_noise_like,
    perturb,
)
from ultra_pytorch_tpu.models.linear import Linear  # noqa: F401
from ultra_pytorch_tpu.models.dnn import DNN  # noqa: F401
from ultra_pytorch_tpu.models.setrank import SetRank  # noqa: F401
from ultra_pytorch_tpu.models.dlcm import DLCM  # noqa: F401
from ultra_pytorch_tpu.models.gsf import GSF  # noqa: F401
