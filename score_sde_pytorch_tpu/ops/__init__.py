"""TPU-native ops replacing the reference's CUDA extensions (op/).

The reference ships two StyleGAN2-derived CUDA kernels (upfirdn2d,
fused_bias_act — /root/reference/op/). Here both are expressed TPU-natively:
upfirdn2d as a single fused `lax.conv_general_dilated` (XLA fuses the
pad/dilate/stride into one op) with a separable two-pass fast path, and
fused_bias_act as a fully-fused elementwise expression (with a Pallas variant
for explicit fusion control on TPU).
"""
from score_sde_pytorch_tpu.ops.upfirdn2d import (
    upfirdn2d,
    upsample_2d,
    downsample_2d,
    upsample_conv_2d,
    conv_downsample_2d,
    naive_upsample_2d,
    naive_downsample_2d,
    setup_kernel,
)
from score_sde_pytorch_tpu.ops.fused_act import fused_leaky_relu
from score_sde_pytorch_tpu.ops.attention import (
    attention_auto,
    dense_attention,
    flash_attention,
)

__all__ = [
    "upfirdn2d", "upsample_2d", "downsample_2d", "upsample_conv_2d",
    "conv_downsample_2d", "naive_upsample_2d", "naive_downsample_2d",
    "setup_kernel", "fused_leaky_relu", "attention_auto", "dense_attention",
    "flash_attention",
]
