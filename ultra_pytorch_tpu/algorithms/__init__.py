from ultra_pytorch_tpu.algorithms.base import (  # noqa: F401
    BaseAlgorithm,
    TrainState,
)
from ultra_pytorch_tpu.algorithms.naive import NaiveAlgorithm  # noqa: F401
from ultra_pytorch_tpu.algorithms.dla import DLA  # noqa: F401
