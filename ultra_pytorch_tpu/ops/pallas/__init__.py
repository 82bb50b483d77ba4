from ultra_pytorch_tpu.ops.pallas.mlp import (  # noqa: F401
    pallas_mlp_available,
    fused_mlp_score,
)
from ultra_pytorch_tpu.ops.pallas.listwise_loss import (  # noqa: F401
    fused_softmax_loss,
)
from ultra_pytorch_tpu.ops.pallas.click_sim import (  # noqa: F401
    pallas_sample_pbm_clicks,
)
