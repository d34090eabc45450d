"""Fused bias + LeakyReLU + gain, TPU-native.

Replaces the reference CUDA kernel (/root/reference/op/fused_act.py,
op/fused_bias_act_kernel.cu): ``out = leaky_relu(x + bias, slope) * scale``.

On TPU this is a pure elementwise chain that XLA fuses into the producing
matmul/conv epilogue on its own, so the default path is plain jnp (zero-copy
when fused). A Pallas kernel is provided for explicit control — useful when
the producer lives in a different jit scope and XLA cannot fuse across it.
The reference's custom autograd pair (op/fused_act.py:20-85) is unnecessary:
JAX differentiates the expression, and the double-backward the CUDA version
hand-codes falls out of composition.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def fused_leaky_relu(x: Array, bias: Array | None = None,
                     negative_slope: float = 0.2,
                     scale: float = math.sqrt(2.0)) -> Array:
  """``leaky_relu(x + bias) * scale`` with bias broadcast over channels (NHWC)."""
  if bias is not None:
    x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
  return jnp.where(x >= 0, x, x * negative_slope) * scale


def fused_leaky_relu_pallas(x: Array, bias: Array | None = None,
                            negative_slope: float = 0.2,
                            scale: float = math.sqrt(2.0),
                            interpret: bool = False) -> Array:
  """Pallas TPU kernel variant of :func:`fused_leaky_relu`.

  Operates on the flattened (rows, channels) view so the channel dim rides
  the 128-lane axis; the row dim is tiled into VMEM-sized blocks (the whole
  array rarely fits the ~16MB scoped VMEM).
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  orig_shape = x.shape
  c = orig_shape[-1]
  rows = math.prod(orig_shape[:-1])
  x2 = x.reshape(rows, c)
  b = (jnp.zeros((1, c), x.dtype) if bias is None
       else bias.reshape(1, c).astype(x.dtype))

  # Row tile: keep in+out blocks within a small VMEM slice.
  block_rows = max(8, min(rows, (2 * 1024 * 1024) // (c * x.dtype.itemsize)))
  block_rows = min(block_rows, rows)
  pad_rows = (-rows) % block_rows
  if pad_rows:
    x2 = jnp.pad(x2, ((0, pad_rows), (0, 0)))
  n_blocks = x2.shape[0] // block_rows

  def kernel(x_ref, b_ref, o_ref):
    v = x_ref[:] + b_ref[:]
    o_ref[:] = jnp.where(v >= 0, v, v * negative_slope) * scale

  space = pl.ANY if interpret else pltpu.VMEM
  out = pl.pallas_call(
      kernel,
      grid=(n_blocks,),
      in_specs=[pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                             memory_space=space),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=space)],
      out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                             memory_space=space),
      out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
      interpret=interpret,
  )(x2, b)
  if pad_rows:
    out = out[:rows]
  return out.reshape(orig_shape)
