"""Blockwise (flash) self-attention Pallas kernel for the H·W grid.

The reference materializes the full O((HW)²) attention matrix
(/root/reference/models/layerspp.py:82-86, models/layers.py:575-579), which
is why every shipped config caps attention at 16×16. This kernel computes
the same single-head softmax attention with online (streaming) softmax over
KV tiles — the logits never exist in HBM — making ``attn_resolutions``
of 32²–64² practical at 256px+ (SURVEY.md §2.7/§5 extension point).

Layout: single head, [B, N, C] with N = H·W, C the channel dim (the NCSN++
attention is channel-wide, not multi-head). Accumulation in fp32.

Grid: (B, N/BQ, N/BK) with the KV dimension innermost and "arbitrary"
semantics — VMEM scratch (running max / sum / accumulator) persists across
the KV steps of one (batch, Q-tile) program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_NEG_INF = -1e30

try:  # pallas is TPU/interpret-only; import guarded for exotic hosts
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  _PALLAS_OK = True
except Exception:  # pragma: no cover
  _PALLAS_OK = False


def dense_attention(q: Array, k: Array, v: Array) -> Array:
  """Reference path: materialized logits (exact same math as the kernel)."""
  c = q.shape[-1]
  logits = jnp.einsum("bnc,bmc->bnm", q, k) * (c ** -0.5)
  attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
  return jnp.einsum("bnm,bmc->bnc", attn.astype(v.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale: float):
  ik = pl.program_id(2)

  @pl.when(ik == 0)
  def _init():
    m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)

  q = q_ref[0].astype(jnp.float32)  # [BQ, C]
  k = k_ref[0].astype(jnp.float32)  # [BK, C]
  v = v_ref[0].astype(jnp.float32)  # [BK, C]

  s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32) * scale
  m_prev = m_ref[...]                      # [BQ, 1]
  m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
  p = jnp.exp(s - m_new)                   # [BQ, BK]
  alpha = jnp.exp(m_prev - m_new)          # [BQ, 1]
  l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
  acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
      p, v, preferred_element_type=jnp.float32)
  m_ref[...] = m_new

  @pl.when(ik == pl.num_programs(2) - 1)
  def _finalize():
    o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q: Array, k: Array, v: Array, *, block_q: int = 512,
                    block_k: int = 512, interpret: bool = False) -> Array:
  """Online-softmax attention; O(N·C) memory instead of O(N²)."""
  b, n, c = q.shape
  block_q = min(block_q, n)
  block_k = min(block_k, n)
  assert n % block_q == 0 and n % block_k == 0, (n, block_q, block_k)
  scale = float(c) ** -0.5

  grid = (b, n // block_q, n // block_k)
  kernel = functools.partial(_flash_kernel, scale=scale)
  return pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, block_q, c), lambda ib, iq, ik: (ib, iq, 0)),
          pl.BlockSpec((1, block_k, c), lambda ib, iq, ik: (ib, ik, 0)),
          pl.BlockSpec((1, block_k, c), lambda ib, iq, ik: (ib, ik, 0)),
      ],
      out_specs=pl.BlockSpec((1, block_q, c), lambda ib, iq, ik: (ib, iq, 0)),
      out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
      scratch_shapes=[
          pltpu.VMEM((block_q, 1), jnp.float32),   # running max
          pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
          pltpu.VMEM((block_q, c), jnp.float32),   # output accumulator
      ],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel", "arbitrary")),
      interpret=interpret,
  )(q, k, v)


def _chunked_softmax_stats(q, k, scale, chunk):
  """Row max and sum of exp for the logits, streamed over KV chunks."""
  b, n, c = q.shape
  nc = k.shape[1] // chunk
  ks = k.reshape(b, nc, chunk, c)

  def step(carry, kj):
    m, l = carry
    s = jnp.einsum("bnc,bjc->bnj", q, kj) * scale
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(s - m_new[..., None]),
                                         axis=-1)
    return (m_new, l), None

  init = (jnp.full((b, n), _NEG_INF, jnp.float32),
          jnp.zeros((b, n), jnp.float32))
  (m, l), _ = jax.lax.scan(step, init, jnp.moveaxis(ks, 1, 0))
  return m, l


def _flash_bwd_impl(q, k, v, out, dout, scale, chunk):
  """Flash-attention backward with O(N·chunk) live memory (no N² logits).

  ds_ij = p_ij (dout_i·v_j − D_i), D_i = dout_i·out_i;
  dq_i = scale Σ_j ds_ij k_j; dk_j = scale Σ_i ds_ij q_i; dv_j = Σ_i p_ij dout_i.
  """
  b, n, c = q.shape
  qf = q.astype(jnp.float32)
  kf = k.astype(jnp.float32)
  vf = v.astype(jnp.float32)
  doutf = dout.astype(jnp.float32)
  m, l = _chunked_softmax_stats(qf, kf, scale, chunk)
  d_row = jnp.sum(doutf * out.astype(jnp.float32), axis=-1)  # [B, N]

  nc = n // chunk
  kc = jnp.moveaxis(kf.reshape(b, nc, chunk, c), 1, 0)
  vc = jnp.moveaxis(vf.reshape(b, nc, chunk, c), 1, 0)

  def step(dq, chunk_kv):
    kj, vj = chunk_kv
    s = jnp.einsum("bnc,bjc->bnj", qf, kj) * scale
    p = jnp.exp(s - m[..., None]) / l[..., None]          # [B, N, J]
    dp = jnp.einsum("bnc,bjc->bnj", doutf, vj)
    ds = p * (dp - d_row[..., None])
    dq = dq + scale * jnp.einsum("bnj,bjc->bnc", ds, kj)
    dkj = scale * jnp.einsum("bnj,bnc->bjc", ds, qf)
    dvj = jnp.einsum("bnj,bnc->bjc", p, doutf)
    return dq, (dkj, dvj)

  dq, (dk, dv) = jax.lax.scan(step, jnp.zeros_like(qf), (kc, vc))
  dk = jnp.moveaxis(dk, 0, 1).reshape(b, n, c)
  dv = jnp.moveaxis(dv, 0, 1).reshape(b, n, c)
  return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, interpret=False):
  return flash_attention(q, k, v, interpret=interpret)


def _flash_fwd(q, k, v, interpret=False):
  out = flash_attention(q, k, v, interpret=interpret)
  return out, (q, k, v, out)


def _flash_bwd(interpret, res, dout):
  q, k, v, out = res
  scale = float(q.shape[-1]) ** -0.5
  chunk = min(512, q.shape[1])
  return _flash_bwd_impl(q, k, v, out, dout, scale, chunk)


_flash.defvjp(_flash_fwd, _flash_bwd)


# Below this grid size the dense path's single fused matmul chain wins
# (kernel launch + scratch setup dominate); above it the O(N²) logits
# round-trip to HBM dominates. 16² grids (every shipped config) stay dense.
FLASH_MIN_N = 1024


def flash_eligible(q: Array) -> bool:
  if not _PALLAS_OK:
    return False
  b, n, c = q.shape
  if n < FLASH_MIN_N:
    return False
  # TPU tiling: lanes want multiples of 128 on the last dim, and the N
  # tiles must divide evenly.
  return c % 128 == 0 and n % 512 == 0


def attention_auto(q: Array, k: Array, v: Array, *,
                   interpret: bool = False) -> Array:
  """Dispatch: flash kernel for large grids, dense einsum otherwise.

  The flash path is differentiable: a custom VJP streams the backward over
  KV chunks (O(N·chunk) live memory — the N² logits never materialize in
  either direction)."""
  if flash_eligible(q):
    # On CPU hosts (tests, virtual meshes) the kernel runs in interpret
    # mode — same program, same math, no Mosaic compile.
    interpret = interpret or jax.devices()[0].platform != "tpu"
    return _flash(q, k, v, interpret)
  return dense_attention(q, k, v)
