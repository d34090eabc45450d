"""upfirdn2d and FIR resampling, TPU-native.

Replaces the reference's CUDA extension (/root/reference/op/upfirdn2d.py,
op/upfirdn2d_kernel.cu) and the StyleGAN2 resampling wrappers
(/root/reference/models/up_or_down_sampling.py). Semantics match the
reference's `upfirdn2d_native` (op/upfirdn2d.py:159-200): upsample by
zero-insertion, pad (possibly negatively), correlate with the *flipped* FIR
kernel (i.e. convolve), then subsample.

TPU design: instead of a hand-written gather kernel, the whole
pad→dilate→filter→stride chain is ONE `lax.conv_general_dilated` call —
`lhs_dilation` performs the zero-insertion, the padding argument absorbs both
the user pad and the trailing dilation zeros (negative padding crops), and
`window_strides` performs the down-sampling. XLA lowers this to a single fused
op and derives the transposed-conv VJP automatically, so no custom autograd
Function pair (reference op/upfirdn2d.py:19-142) is needed. Separable FIR
kernels (every kernel the reference ships: outer products of 1-D windows)
take a two-pass 1-D path which does 2k multiply–adds per output instead of
k^2.

All tensors are NHWC (TPU-native layout; lane dim = channels).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array


def setup_kernel(k: Union[Sequence[float], np.ndarray]) -> np.ndarray:
  """Normalize a FIR kernel; 1-D kernels stay 1-D (separable fast path).

  Mirrors `_setup_kernel` (reference up_or_down_sampling.py:181-188) except
  that separability is preserved instead of materializing the outer product.
  """
  k = np.asarray(k, dtype=np.float32)
  if k.ndim == 1:
    return k / np.sum(k)  # outer(k,k)/sum == outer(k/sum, k/sum)
  k = k / np.sum(k)
  assert k.ndim == 2 and k.shape[0] == k.shape[1]
  return k


def _upfirdn_axis(x: Array, k1d: Array, up: int, down: int,
                  pad: Tuple[int, int], axis: int) -> Array:
  """One 1-D upfirdn pass along a spatial axis (1=H, 2=W) of an NHWC tensor."""
  c = x.shape[-1]
  kh = k1d.shape[0]
  # Depthwise conv: same 1-D filter for every channel.
  if axis == 1:
    rhs = jnp.tile(k1d[::-1].reshape(kh, 1, 1, 1), (1, 1, 1, c))
    lhs_dilation = (up, 1)
    strides = (down, 1)
    padding = ((pad[0], pad[1] + up - 1), (0, 0))
  else:
    rhs = jnp.tile(k1d[::-1].reshape(1, kh, 1, 1), (1, 1, 1, c))
    lhs_dilation = (1, up)
    strides = (1, down)
    padding = ((0, 0), (pad[0], pad[1] + up - 1))
  # HIGHEST precision: this is a pure FIR filter (4 MACs/output, bandwidth
  # bound) and the reference CUDA kernel computes it in exact fp32; TPU's
  # default conv precision would silently round the activations to bf16.
  return lax.conv_general_dilated(
      x, rhs.astype(x.dtype), window_strides=strides, padding=padding,
      lhs_dilation=lhs_dilation,
      dimension_numbers=("NHWC", "HWIO", "NHWC"),
      feature_group_count=c, precision=lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("up", "down", "pad"))
def _upfirdn2d_impl(x: Array, kernel: Array, up: Tuple[int, int],
                    down: Tuple[int, int],
                    pad: Tuple[int, int, int, int]) -> Array:
  up_y, up_x = up
  down_y, down_x = down
  pad_y0, pad_y1, pad_x0, pad_x1 = pad
  if kernel.ndim == 1:
    # Separable: H pass then W pass.
    x = _upfirdn_axis(x, kernel, up_y, down_y, (pad_y0, pad_y1), axis=1)
    x = _upfirdn_axis(x, kernel, up_x, down_x, (pad_x0, pad_x1), axis=2)
    return x
  c = x.shape[-1]
  kh, kw = kernel.shape
  # Flip → true convolution, matching reference op/upfirdn2d.py:193.
  rhs = jnp.tile(kernel[::-1, ::-1].reshape(kh, kw, 1, 1), (1, 1, 1, c))
  return lax.conv_general_dilated(
      x, rhs.astype(x.dtype),
      window_strides=(down_y, down_x),
      # Trailing zeros of the zero-insertion upsample (reference pads *after*
      # each pixel incl. the last; lhs_dilation only pads between) fold into
      # the high-side padding.
      padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
      lhs_dilation=(up_y, up_x),
      dimension_numbers=("NHWC", "HWIO", "NHWC"),
      feature_group_count=c, precision=lax.Precision.HIGHEST)


def upfirdn2d(x: Array, kernel: Array, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)) -> Array:
  """Upsample→FIR→downsample an NHWC batch.

  Matches reference `op.upfirdn2d(input, kernel, up, down, pad)`
  (op/upfirdn2d.py:145-156) with NHWC instead of NCHW. ``pad`` is
  ``(lo, hi)`` applied to both spatial axes; entries may be negative.
  Output spatial size: ``(in*up + pad0 + pad1 - k) // down + 1``.

  This fused-conv expression IS the fast path on TPU: a hand-written Pallas
  kernel (two VMEM-resident 1-D passes, removed 2026-08) measured 0.44-0.88x
  of this path on every NCSN++ hot shape on v5e and VMEM-OOMed on 256px
  trunk shapes, so — unlike the reference's CUDA kernel, which beats
  unfused torch ops on GPU — the XLA lowering wins outright here (see
  PARITY.md "Pallas upfirdn2d" for the measurements).
  """
  kernel = jnp.asarray(kernel)
  return _upfirdn2d_impl(x, kernel, (up, up), (down, down),
                         (pad[0], pad[1], pad[0], pad[1]))


def upsample_2d(x: Array, k=None, factor: int = 2, gain: float = 1.0) -> Array:
  """FIR upsampling by ``factor`` (reference up_or_down_sampling.py:195-226)."""
  assert isinstance(factor, int) and factor >= 1
  if k is None:
    k = [1.0] * factor
  k = setup_kernel(k)
  kh = k.shape[0]
  p = kh - factor
  scale = gain * (factor ** 2)
  k_scaled = k * (scale if k.ndim == 2 else np.sqrt(scale))
  return upfirdn2d(x, jnp.asarray(k_scaled), up=factor,
                   pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: Array, k=None, factor: int = 2, gain: float = 1.0) -> Array:
  """FIR downsampling by ``factor`` (reference up_or_down_sampling.py:229-257)."""
  assert isinstance(factor, int) and factor >= 1
  if k is None:
    k = [1.0] * factor
  k = setup_kernel(k)
  kh = k.shape[0]
  p = kh - factor
  k_scaled = k * (gain if k.ndim == 2 else np.sqrt(gain))
  return upfirdn2d(x, jnp.asarray(k_scaled), down=factor,
                   pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(x: Array, w: Array, k=None, factor: int = 2,
                     gain: float = 1.0) -> Array:
  """Fused transposed-conv upsample + FIR (reference up_or_down_sampling.py:72-141).

  ``w`` is HWIO ``[convH, convW, inC, outC]`` (our native layout; the
  reference uses OIHW). The transposed conv is expressed as
  `conv_general_dilated` with ``lhs_dilation=factor`` and full padding on the
  spatially-flipped kernel — the canonical XLA form, one fused op.
  """
  assert isinstance(factor, int) and factor >= 1
  convh, convw, _inc, _outc = w.shape
  assert convh == convw
  if k is None:
    k = [1.0] * factor
  k = setup_kernel(k)
  kh = k.shape[0]
  p = (kh - factor) - (convw - 1)

  # conv_transpose(x, w, stride=f, VALID) == conv(dilate_f(x), flip(w), pad=k-1)
  y = lax.conv_general_dilated(
      x, w[::-1, ::-1].astype(x.dtype),
      window_strides=(1, 1),
      padding=((convh - 1, convh - 1), (convw - 1, convw - 1)),
      lhs_dilation=(factor, factor),
      dimension_numbers=("NHWC", "HWIO", "NHWC"))
  scale = gain * (factor ** 2)
  k_scaled = k * (scale if k.ndim == 2 else np.sqrt(scale))
  return upfirdn2d(y, jnp.asarray(k_scaled),
                   pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x: Array, w: Array, k=None, factor: int = 2,
                       gain: float = 1.0) -> Array:
  """Fused FIR + strided conv downsample (reference up_or_down_sampling.py:144-178).

  ``w`` is HWIO ``[convH, convW, inC, outC]``.
  """
  assert isinstance(factor, int) and factor >= 1
  convh, convw, _inc, _outc = w.shape
  assert convh == convw
  if k is None:
    k = [1.0] * factor
  k = setup_kernel(k)
  kh = k.shape[0]
  p = (kh - factor) + (convw - 1)
  k_scaled = k * (gain if k.ndim == 2 else np.sqrt(gain))
  x = upfirdn2d(x, jnp.asarray(k_scaled), pad=((p + 1) // 2, p // 2))
  return lax.conv_general_dilated(
      x, w.astype(x.dtype), window_strides=(factor, factor), padding="VALID",
      dimension_numbers=("NHWC", "HWIO", "NHWC"))


def naive_upsample_2d(x: Array, factor: int = 2) -> Array:
  """Nearest-neighbour upsample (reference up_or_down_sampling.py:59-63), NHWC."""
  n, h, w, c = x.shape
  x = x.reshape(n, h, 1, w, 1, c)
  x = jnp.broadcast_to(x, (n, h, factor, w, factor, c))
  return x.reshape(n, h * factor, w * factor, c)


def naive_downsample_2d(x: Array, factor: int = 2) -> Array:
  """Mean-pool downsample (reference up_or_down_sampling.py:66-69), NHWC."""
  n, h, w, c = x.shape
  x = x.reshape(n, h // factor, factor, w // factor, factor, c)
  return jnp.mean(x, axis=(2, 4))
