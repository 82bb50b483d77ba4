from ultra_pytorch_tpu.ops.pallas.mlp import (  # noqa: F401
    pallas_mlp_available,
    fused_mlp_score,
)
