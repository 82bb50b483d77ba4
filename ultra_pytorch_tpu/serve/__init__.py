"""Production inference serving.

The reference toolbox stops at offline evaluation (``main.py --test_only``
writes a TREC ranklist, ref ``main.py:216-257``); it has no online serving
path at all. This subsystem is new: a checkpoint-loading batched
:class:`Scorer` with shape-bucketed jit compilation (static shapes for
XLA, bounded compile count), and a dependency-free local HTTP ranking
service on top of it.
"""

from ultra_pytorch_tpu.serve.scorer import Scorer
from ultra_pytorch_tpu.serve.batching import MicroBatcher
from ultra_pytorch_tpu.serve.http_service import make_server, serve

__all__ = ["Scorer", "MicroBatcher", "make_server", "serve"]
