from ultra_pytorch_tpu.utils.hparams import HParams  # noqa: F401
from ultra_pytorch_tpu.utils.registry import find_class, list_available, register  # noqa: F401
