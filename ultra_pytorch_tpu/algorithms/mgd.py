"""Multileave Gradient Descent (MGD).

Capability parity with ref ``ultra/learning_algorithm/mgd.py`` (Schuth et
al. WSDM'16): DBGD with ``ranker_num`` (default 4) simultaneously perturbed
rankers multileaved in one comparison (ref ``:115-126``); the update is the
winner-share-weighted combination of the candidate noises
(ref ``compute_gradient`` ``:205-232``). All machinery is inherited from
:class:`DBGD`, which already supports R perturbed rankers.
"""

from __future__ import annotations

from ultra_pytorch_tpu.algorithms.dbgd import DBGD
from ultra_pytorch_tpu.utils.registry import register


@register("algorithm", "MGD", aliases=["ultra.learning_algorithm.MGD"])
class MGD(DBGD):

    name = "mgd"

    def default_hparams(self):
        # ref mgd.py:40-48
        hp = super().default_hparams()
        hp.update({"ranker_num": 4})
        return hp
