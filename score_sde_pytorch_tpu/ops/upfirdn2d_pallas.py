"""Pallas TPU kernel: fused separable upfirdn2d.

The XLA path (`ops.upfirdn2d`) lowers the separable FIR to two depthwise
convolutions with an HBM round-trip for the intermediate. This kernel fuses
both 1-D passes inside one VMEM-resident block per batch element: the H-pass
intermediate never leaves VMEM, halving HBM traffic for the op. The FIR taps
are unrolled at trace time into phase-decomposed shifted multiply–adds on the
VPU (no gather, no conv machinery).

Supported: separable (1-D) kernels, ``up``/``down`` ∈ {1, 2} (not both > 1),
arbitrary static pads — exactly the cases NCSN++ uses
(/root/reference/models/up_or_down_sampling.py:112,174,195-257). Larger
blocks than the VMEM budget or non-separable kernels fall back to the XLA
path automatically via :func:`upfirdn2d_auto`.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Scoped VMEM is ~16MB/core on v5e; the trace-time unrolled taps allocate
# several block-sized temporaries (padded input, per-phase accumulators,
# interleave stack), empirically ~6x (in+out). Stay well under the limit.
_VMEM_LIMIT_BYTES = 14 * 1024 * 1024
_TEMP_FACTOR = 6


def _phase_taps(k: Sequence[float], up: int, down: int,
                pad0: int, n_in: int) -> Tuple[int, list]:
  """Decompose the 1-D upfirdn into per-output-phase shifted taps.

  out[j] = sum_m kf[m] * u[j*down + m],  u[i] = x[(i-pad0)/up] when
  (i-pad0) % up == 0 (zero otherwise), with kf the flipped kernel.
  For phase p (j = up*t + p when up>1, else p=0), each contributing tap m
  reduces to kf[m] * x[t + c] for a static offset c.
  Returns (n_phases, [[(c, weight), ...] per phase]).
  """
  kf = list(reversed([float(v) for v in k]))
  n_phases = up
  phases = []
  for p in range(n_phases):
    taps = []
    for m in range(len(kf)):
      num = p * down + m - pad0
      if num % up == 0:
        taps.append((num // up, kf[m]))
      # offset for general t: ((up*t+p)*down + m - pad0)/up = t*down + c
      # (valid only when up==1 or down==1, enforced by caller)
    phases.append(taps)
  return n_phases, phases


def _apply_axis(x: Array, k: Sequence[float], up: int, down: int,
                pad: Tuple[int, int], axis: int, out_len: int) -> Array:
  """One 1-D upfirdn pass on a block, unrolled taps (trace-time)."""
  n_in = x.shape[axis]
  n_phases, phases = _phase_taps(k, up, down, pad[0], n_in)
  # Padded input so every tap offset is a valid static slice.
  max_off = max((abs(c) for taps in phases for c, _ in taps), default=0)
  guard = max_off + len(k) + 2
  pad_widths = [(0, 0)] * x.ndim
  pad_widths[axis] = (guard, guard)
  xp = jnp.pad(x, pad_widths)

  def take(start, length):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start + guard, start + guard + length)
    return xp[tuple(idx)]

  phase_outs = []
  t_len = -(-out_len // n_phases)  # per-phase output length (ceil)
  for p, taps in enumerate(phases):
    acc = None
    for c, wgt in taps:
      # out_p[t] = sum w * x[t*down + c]
      seg = take(c, t_len * down)
      if down > 1:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, t_len * down, down)
        seg = seg[tuple(idx)]
      contrib = seg * wgt
      acc = contrib if acc is None else acc + contrib
    if acc is None:
      shape = list(x.shape)
      shape[axis] = t_len
      acc = jnp.zeros(shape, x.dtype)
    phase_outs.append(acc)

  if n_phases == 1:
    out = phase_outs[0]
  else:
    # Interleave phases along axis: stack then reshape.
    stacked = jnp.stack(phase_outs, axis=axis + 1)
    shape = list(stacked.shape)
    shape[axis] = shape[axis] * shape[axis + 1]
    del shape[axis + 1]
    out = stacked.reshape(shape)
  idx = [slice(None)] * x.ndim
  idx[axis] = slice(0, out_len)
  return out[tuple(idx)]


def _out_len(n: int, up: int, down: int, pad: Tuple[int, int],
             klen: int) -> int:
  return (n * up + pad[0] + pad[1] - klen) // down + 1


def _c_tile(h: int, w: int, c: int, out_h: int, out_w: int,
            itemsize: int) -> int:
  """Largest channel tile (divisor of c) that keeps the block plus its
  trace-time temporaries in VMEM. upfirdn2d is channelwise-independent, so
  channel tiling needs no halo — the grid just grows a C dimension."""
  per_c = _TEMP_FACTOR * (h * w + out_h * out_w) * itemsize
  budget = max(1, _VMEM_LIMIT_BYTES // per_c)
  for t in range(min(c, budget), 0, -1):
    if c % t == 0:
      return t
  return 1


@functools.partial(jax.jit,
                   static_argnames=("k", "up", "down", "pad", "interpret"))
def upfirdn2d_pallas(x: Array, k: Tuple[float, ...], up: int = 1,
                     down: int = 1, pad: Tuple[int, int] = (0, 0),
                     interpret: bool = False) -> Array:
  """Fused separable upfirdn2d on NHWC, one Pallas program per
  (batch row, channel tile).

  ``k`` is the 1-D (separable) FIR kernel as a static tuple. Channel tiling
  (halo-free — the op is channelwise) bounds VMEM for wide activations.
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  assert not (up > 1 and down > 1), "fused path supports up XOR down"
  n, h, w, c = x.shape
  klen = len(k)
  out_h = _out_len(h, up, down, pad, klen)
  out_w = _out_len(w, up, down, pad, klen)
  tc = _c_tile(h, w, c, out_h, out_w, x.dtype.itemsize)

  def kernel(x_ref, o_ref):
    blk = x_ref[0]  # [H, W, TC]
    blk = _apply_axis(blk, k, up, down, pad, axis=0, out_len=out_h)
    blk = _apply_axis(blk, k, up, down, pad, axis=1, out_len=out_w)
    o_ref[0] = blk

  return pl.pallas_call(
      kernel,
      grid=(n, c // tc),
      in_specs=[pl.BlockSpec((1, h, w, tc), lambda i, j: (i, 0, 0, j),
                             memory_space=pltpu.ANY if interpret
                             else pltpu.VMEM)],
      out_specs=pl.BlockSpec((1, out_h, out_w, tc),
                             lambda i, j: (i, 0, 0, j),
                             memory_space=pltpu.ANY if interpret
                             else pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, out_h, out_w, c), x.dtype),
      interpret=interpret,
  )(x)


def pallas_eligible(x: Array, k, up: int, down: int) -> bool:
  """Whether the fused Pallas path applies (separable, 2D, some channel
  tile fits VMEM)."""
  k = np.asarray(k)
  if k.ndim != 1:
    return False
  if up > 1 and down > 1:
    return False
  n, h, w, c = x.shape
  klen = len(k)
  out_h = _out_len(h, up, down, (klen,) * 2, klen)
  out_w = _out_len(w, up, down, (klen,) * 2, klen)
  # even a single channel must fit
  per_c = _TEMP_FACTOR * (h * w + out_h * out_w) * x.dtype.itemsize
  return per_c < _VMEM_LIMIT_BYTES


def upfirdn2d_auto(x: Array, kernel, up: int = 1, down: int = 1,
                   pad: Tuple[int, int] = (0, 0),
                   interpret: bool = False) -> Array:
  """Dispatch: fused Pallas kernel when eligible, XLA path otherwise."""
  from score_sde_pytorch_tpu.ops.upfirdn2d import upfirdn2d as xla_upfirdn2d
  k = np.asarray(kernel)
  if pallas_eligible(x, k, up, down):
    return upfirdn2d_pallas(x, tuple(float(v) for v in k), up=up, down=down,
                            pad=tuple(pad), interpret=interpret)
  return xla_upfirdn2d(x, jnp.asarray(kernel), up=up, down=down,
                       pad=tuple(pad))
