from ultra_pytorch_tpu.algorithms.base import (  # noqa: F401
    BaseAlgorithm,
    TrainState,
)
from ultra_pytorch_tpu.algorithms.naive import NaiveAlgorithm  # noqa: F401
from ultra_pytorch_tpu.algorithms.dla import DLA  # noqa: F401
from ultra_pytorch_tpu.algorithms.ipw import IPWrank  # noqa: F401
from ultra_pytorch_tpu.algorithms.regression_em import RegressionEM  # noqa: F401
from ultra_pytorch_tpu.algorithms.pairwise_debias import PairDebias  # noqa: F401
from ultra_pytorch_tpu.algorithms.pdgd import PDGD  # noqa: F401
from ultra_pytorch_tpu.algorithms.lambda_rank import LambdaRank  # noqa: F401
from ultra_pytorch_tpu.algorithms.prs_rank import PRSrank  # noqa: F401
from ultra_pytorch_tpu.algorithms.dbgd import DBGD  # noqa: F401
from ultra_pytorch_tpu.algorithms.mgd import MGD  # noqa: F401
from ultra_pytorch_tpu.algorithms.nsgd import NSGD  # noqa: F401
