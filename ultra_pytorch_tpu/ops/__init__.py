from ultra_pytorch_tpu.ops.losses import (  # noqa: F401
    softmax_cross_entropy_with_logits,
    softmax_loss,
    sigmoid_loss_on_list,
    pairwise_loss_on_list,
    pairwise_cross_entropy_loss,
    l2_loss,
    LOSS_FUNCTIONS,
)
