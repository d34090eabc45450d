"""NCSN++ layers (flax.linen, NHWC).

Rebuild of /root/reference/models/layerspp.py and the StyleGAN2 fused conv
from models/up_or_down_sampling.py:23-56. FIR resampling routes through
score_sde_pytorch_tpu.ops (fused XLA upfirdn2d).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from score_sde_pytorch_tpu import ops
from score_sde_pytorch_tpu.models.layers import (
    NIN, GroupNorm, ddpm_conv1x1, ddpm_conv3x3, default_init)

Array = jax.Array
conv1x1 = ddpm_conv1x1
conv3x3 = ddpm_conv3x3


class GaussianFourierProjection(nn.Module):
  """Gaussian Fourier features for noise levels (reference layerspp.py:32-41).

  W is a fixed random projection — a parameter with zero gradient
  (stop_gradient), matching the reference's requires_grad=False buffer.
  """
  embedding_size: int = 256
  scale: float = 1.0

  @nn.compact
  def __call__(self, x: Array) -> Array:
    w = self.param("W", nn.initializers.normal(stddev=self.scale),
                   (self.embedding_size,))
    w = jax.lax.stop_gradient(w)
    x_proj = x[:, None] * w[None, :] * 2 * jnp.pi
    return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class Combine(nn.Module):
  """Combine a progressive-input branch with the trunk (reference layerspp.py:44-59)."""
  dim2: int
  method: str = "cat"
  dtype: Any = None

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    h = conv1x1(self.dim2, dtype=self.dtype, name="Conv_0")(x).astype(y.dtype)
    if self.method == "cat":
      return jnp.concatenate([h, y], axis=-1)
    if self.method == "sum":
      return h + y
    raise ValueError(f"Method {self.method} not recognized.")


class AttnBlockpp(nn.Module):
  """Channel-wise self-attention w/ skip rescale (reference layerspp.py:62-91)."""
  skip_rescale: bool = False
  init_scale: float = 0.0
  dtype: Any = None

  @nn.compact
  def __call__(self, x: Array) -> Array:
    b, h, w, c = x.shape
    hid = GroupNorm(num_groups=min(c // 4, 32), epsilon=1e-6,
                    name="GroupNorm_0")(x)
    q = NIN(c, dtype=self.dtype, name="NIN_0")(hid)
    k = NIN(c, dtype=self.dtype, name="NIN_1")(hid)
    v = NIN(c, dtype=self.dtype, name="NIN_2")(hid)
    # Flatten the H·W grid before the contractions: [B, HW, C] matmuls tile
    # onto the MXU (the reference's bhwc,bijc->bhwij shape leaves 16-wide
    # trailing dims — measured 20x off roofline). Identical math. Grids
    # ≥32² route to the Pallas flash kernel (O(N·C) memory, the logits
    # never hit HBM) — the reference's O((HW)²) materialization is why it
    # caps attention at 16² (layerspp.py:82-86).
    n = h * w
    qf, kf, vf = (z.reshape(b, n, c) for z in (q, k, v))
    out = ops.attention_auto(qf, kf, vf)
    out = out.reshape(b, h, w, c)
    out = NIN(c, init_scale=self.init_scale, dtype=self.dtype,
              name="NIN_3")(out)
    out = out.astype(x.dtype)
    if not self.skip_rescale:
      return x + out
    return (x + out) / math.sqrt(2.0)


class Conv2dFused(nn.Module):
  """StyleGAN2 conv with fused up/down FIR resampling
  (reference up_or_down_sampling.py:23-56). Weight layout HWIO."""
  out_ch: int
  kernel: int = 3
  up: bool = False
  down: bool = False
  resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
  use_bias: bool = True
  kernel_init: Any = None
  dtype: Any = None

  @nn.compact
  def __call__(self, x: Array) -> Array:
    assert not (self.up and self.down)
    assert self.kernel >= 1 and self.kernel % 2 == 1
    in_ch = x.shape[-1]
    init = self.kernel_init or nn.initializers.zeros
    w = self.param("weight", init,
                   (self.kernel, self.kernel, in_ch, self.out_ch))
    if self.dtype is not None:
      x, w = x.astype(self.dtype), w.astype(self.dtype)
    if self.up:
      x = ops.upsample_conv_2d(x, w, k=self.resample_kernel)
    elif self.down:
      x = ops.conv_downsample_2d(x, w, k=self.resample_kernel)
    else:
      x = jax.lax.conv_general_dilated(
          x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
          dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if self.use_bias:
      b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
      x = x + b.reshape(1, 1, 1, -1)
    return x


class Upsample(nn.Module):
  """2x upsample: naive or FIR, optional conv (reference layerspp.py:94-127)."""
  out_ch: Optional[int] = None
  with_conv: bool = False
  fir: bool = False
  fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
  dtype: Any = None

  @nn.compact
  def __call__(self, x: Array) -> Array:
    b, h, w, c = x.shape
    out_ch = self.out_ch or c
    if not self.fir:
      y = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
      if self.with_conv:
        y = conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(y)
    else:
      if not self.with_conv:
        y = ops.upsample_2d(x, self.fir_kernel, factor=2)
      else:
        y = Conv2dFused(out_ch, kernel=3, up=True,
                        resample_kernel=self.fir_kernel, use_bias=True,
                        kernel_init=default_init(), dtype=self.dtype,
                        name="Conv2d_0")(x)
    return y


class Downsample(nn.Module):
  """2x downsample: naive or FIR, optional conv (reference layerspp.py:130-163)."""
  out_ch: Optional[int] = None
  with_conv: bool = False
  fir: bool = False
  fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
  dtype: Any = None

  @nn.compact
  def __call__(self, x: Array) -> Array:
    b, h, w, c = x.shape
    out_ch = self.out_ch or c
    if not self.fir:
      if self.with_conv:
        y = conv3x3(out_ch, stride=2, padding=[(0, 1), (0, 1)],
                    dtype=self.dtype, name="Conv_0")(x)
      else:
        y = nn.avg_pool(x, (2, 2), strides=(2, 2))
    else:
      if not self.with_conv:
        y = ops.downsample_2d(x, self.fir_kernel, factor=2)
      else:
        y = Conv2dFused(out_ch, kernel=3, down=True,
                        resample_kernel=self.fir_kernel, use_bias=True,
                        kernel_init=default_init(), dtype=self.dtype,
                        name="Conv2d_0")(x)
    return y


class ResnetBlockDDPMpp(nn.Module):
  """DDPM-style resblock (reference layerspp.py:166-209)."""
  act: Callable[[Array], Array]
  out_ch: Optional[int] = None
  conv_shortcut: bool = False
  dropout: float = 0.1
  skip_rescale: bool = False
  init_scale: float = 0.0
  temb_dim: Optional[int] = None
  dtype: Any = None

  @nn.compact
  def __call__(self, x: Array, temb: Optional[Array] = None,
               deterministic: bool = True) -> Array:
    in_ch = x.shape[-1]
    out_ch = self.out_ch or in_ch
    h = self.act(GroupNorm(num_groups=min(in_ch // 4, 32), epsilon=1e-6,
                           name="GroupNorm_0")(x))
    h = conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(h)
    if temb is not None:
      h += nn.Dense(out_ch, kernel_init=default_init(),
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="Dense_0")(self.act(temb))[:, None, None, :]
    h = self.act(GroupNorm(num_groups=min(out_ch // 4, 32), epsilon=1e-6,
                           name="GroupNorm_1")(h))
    h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
    h = conv3x3(out_ch, init_scale=self.init_scale, dtype=self.dtype,
                name="Conv_1")(h)
    if in_ch != out_ch:
      if self.conv_shortcut:
        x = conv3x3(out_ch, dtype=self.dtype, name="Conv_2")(x)
      else:
        x = NIN(out_ch, dtype=self.dtype, name="NIN_0")(x)
    h = h.astype(x.dtype)
    if not self.skip_rescale:
      return x + h
    return (x + h) / math.sqrt(2.0)


class ResnetBlockBigGANpp(nn.Module):
  """BigGAN-style resblock with in-block resampling (reference layerspp.py:212-274)."""
  act: Callable[[Array], Array]
  out_ch: Optional[int] = None
  up: bool = False
  down: bool = False
  dropout: float = 0.1
  fir: bool = False
  fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
  skip_rescale: bool = True
  init_scale: float = 0.0
  temb_dim: Optional[int] = None
  dtype: Any = None

  @nn.compact
  def __call__(self, x: Array, temb: Optional[Array] = None,
               deterministic: bool = True) -> Array:
    in_ch = x.shape[-1]
    out_ch = self.out_ch or in_ch
    h = self.act(GroupNorm(num_groups=min(in_ch // 4, 32), epsilon=1e-6,
                           name="GroupNorm_0")(x))
    if self.up:
      if self.fir:
        h = ops.upsample_2d(h, self.fir_kernel, factor=2)
        x = ops.upsample_2d(x, self.fir_kernel, factor=2)
      else:
        h = ops.naive_upsample_2d(h, factor=2)
        x = ops.naive_upsample_2d(x, factor=2)
    elif self.down:
      if self.fir:
        h = ops.downsample_2d(h, self.fir_kernel, factor=2)
        x = ops.downsample_2d(x, self.fir_kernel, factor=2)
      else:
        h = ops.naive_downsample_2d(h, factor=2)
        x = ops.naive_downsample_2d(x, factor=2)
    h = conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(h)
    if temb is not None:
      h += nn.Dense(out_ch, kernel_init=default_init(),
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="Dense_0")(self.act(temb))[:, None, None, :]
    h = self.act(GroupNorm(num_groups=min(out_ch // 4, 32), epsilon=1e-6,
                           name="GroupNorm_1")(h))
    h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
    h = conv3x3(out_ch, init_scale=self.init_scale, dtype=self.dtype,
                name="Conv_1")(h)
    if in_ch != out_ch or self.up or self.down:
      x = conv1x1(out_ch, dtype=self.dtype, name="Conv_2")(x)
    h = h.astype(x.dtype)
    if not self.skip_rescale:
      return x + h
    return (x + h) / math.sqrt(2.0)
