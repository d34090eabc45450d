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

  Operates on the flattened (rows, channels) view so the channel dim rides the
  128-lane axis; one VMEM-resident elementwise pass.
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  orig_shape = x.shape
  c = orig_shape[-1]
  rows = math.prod(orig_shape[:-1])
  x2 = x.reshape(rows, c)
  b = jnp.zeros((1, c), x.dtype) if bias is None else bias.reshape(1, c).astype(x.dtype)

  def kernel(x_ref, b_ref, o_ref):
    v = x_ref[:] + b_ref[:]
    o_ref[:] = jnp.where(v >= 0, v, v * negative_slope) * scale

  out = pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
      in_specs=[pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
      interpret=interpret,
  )(x2, b)
  return out.reshape(orig_shape)
