"""ULTRA-TPU: a TPU-native unbiased learning-to-rank framework.

A ground-up JAX/XLA/Pallas re-design of the capability set of the
ULTR-Community/ULTRA_pytorch toolbox (reference layer map: SURVEY.md §1).
Everything on the compute path is a pure function over fixed-shape arrays:

- ``data``       LETOR/ULTRA/ULTRE/libsvm ingestion into device-resident
                 ``[Q, L, F]`` tensors (replaces the per-step host feed-dict
                 rebuild of the reference, ref ``main.py:151-223``).
- ``sim``        vectorized on-device click models (PBM / UBM / cascade),
                 propensity estimators, Plackett-Luce sampling, team-draft
                 interleaving (ref ``ultra/utils/click_models.py``).
- ``models``     ranking scorers: Linear / DNN / SetRank as param-pytree
                 ``init``/``apply`` pairs scoring whole lists ``[B,L,F]->[B,L]``.
- ``algorithms`` learning algorithms (NA, DLA, IPW, RegressionEM, PDGD,
                 PairwiseDebias, LambdaRank, PRSRank, DBGD, MGD, NSGD) as
                 ``(init_state, train_step, score)`` triples; the whole
                 train step is one jitted program.
- ``ops``        mask-aware listwise/pairwise losses + Pallas kernels.
- ``metrics``    MRR/ERR/ARP/NDCG/DCG/Precision/MAP/OPA, multi-cutoff.
- ``parallel``   mesh construction + data-parallel sharding over ICI/DCN.
- ``input_layer`` batch feeds (click simulation, direct label, online
                 deterministic/stochastic) built on the sim layer.
"""

__version__ = "0.1.0"

from ultra_pytorch_tpu.utils import hparams  # noqa: F401
from ultra_pytorch_tpu.utils.registry import find_class, list_available  # noqa: F401
