"""Normalization zoo (NCSN lineage), flax.linen, NHWC.

Rebuild of /root/reference/models/normalization.py. Instance statistics are
over the spatial axes (1, 2) in NHWC.
"""
from __future__ import annotations

import functools
import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_NORMAL_1_002 = nn.initializers.normal(stddev=0.02)


def _embed_scale_init(key, shape, dtype=jnp.float32):
  """N(1, 0.02) initializer used for scale embeddings."""
  return 1.0 + _NORMAL_1_002(key, shape, dtype)


def _instance_norm(x: Array, eps: float = 1e-5) -> Array:
  # Statistics in fp32 regardless of compute dtype (bf16 models keep norms
  # full-precision, same policy as NCSN++).
  x = x.astype(jnp.float32)
  mean = jnp.mean(x, axis=(1, 2), keepdims=True)
  var = jnp.var(x, axis=(1, 2), keepdims=True)
  return (x - mean) * jax.lax.rsqrt(var + eps)


class InstanceNorm2d(nn.Module):
  """Plain (non-affine) instance norm, torch InstanceNorm2d semantics."""
  bias: bool = True  # unused; parity with torch signature

  @nn.compact
  def __call__(self, x: Array) -> Array:
    return _instance_norm(x)


class VarianceNorm2d(nn.Module):
  """Scale-only variance normalization (reference normalization.py:108-121)."""
  bias: bool = False

  @nn.compact
  def __call__(self, x: Array) -> Array:
    c = x.shape[-1]
    x = x.astype(jnp.float32)
    alpha = self.param("alpha", _embed_scale_init, (c,))
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    h = x * jax.lax.rsqrt(var + 1e-5)
    return h * alpha.reshape(1, 1, 1, c)


class NoneNorm2d(nn.Module):
  bias: bool = True

  @nn.compact
  def __call__(self, x: Array) -> Array:
    return x


class InstanceNorm2dPlus(nn.Module):
  """NCSN's signature norm: instance norm + re-injected normalized means
  (reference normalization.py:157-178)."""
  bias: bool = True

  @nn.compact
  def __call__(self, x: Array) -> Array:
    c = x.shape[-1]
    x = x.astype(jnp.float32)
    alpha = self.param("alpha", _embed_scale_init, (c,))
    gamma = self.param("gamma", _embed_scale_init, (c,))
    means = jnp.mean(x, axis=(1, 2))  # [B, C]
    m = jnp.mean(means, axis=-1, keepdims=True)
    v = jnp.var(means, axis=-1, keepdims=True, ddof=1)
    means = (means - m) * jax.lax.rsqrt(v + 1e-5)
    h = _instance_norm(x)
    h = h + means[:, None, None, :] * alpha.reshape(1, 1, 1, c)
    out = gamma.reshape(1, 1, 1, c) * h
    if self.bias:
      beta = self.param("beta", nn.initializers.zeros, (c,))
      out = out + beta.reshape(1, 1, 1, c)
    return out


class ConditionalInstanceNorm2dPlus(nn.Module):
  """Noise-index-conditional InstanceNorm++ (reference normalization.py:181-215)."""
  num_features: int
  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    c = self.num_features
    n_emb = 3 * c if self.bias else 2 * c

    def embed_init(key, shape, dtype=jnp.float32):
      base = _NORMAL_1_002(key, shape, dtype)
      if self.bias:
        # first 2c chunks ~ N(1, .02), last c chunk zero
        return jnp.concatenate(
            [1.0 + base[:, :2 * c], jnp.zeros_like(base[:, 2 * c:])], axis=1)
      return 1.0 + base

    embed = self.param("embed", embed_init, (self.num_classes, n_emb))
    e = embed[y]  # [B, n_emb]
    x = x.astype(jnp.float32)
    means = jnp.mean(x, axis=(1, 2))
    m = jnp.mean(means, axis=-1, keepdims=True)
    v = jnp.var(means, axis=-1, keepdims=True, ddof=1)
    means = (means - m) * jax.lax.rsqrt(v + 1e-5)
    h = _instance_norm(x)
    if self.bias:
      gamma, alpha, beta = e[:, :c], e[:, c:2 * c], e[:, 2 * c:]
    else:
      gamma, alpha = e[:, :c], e[:, c:]
      beta = None
    h = h + means[:, None, None, :] * alpha[:, None, None, :]
    out = gamma[:, None, None, :] * h
    if beta is not None:
      out = out + beta[:, None, None, :]
    return out


class ConditionalBatchNorm2d(nn.Module):
  """Class-conditional batch norm (reference normalization.py:43-65).

  Non-affine batch normalization with per-class gamma (init U[0,1), the
  reference's ``.uniform_()``) and beta (zeros) from an embedding table.
  ``train`` toggles batch vs running statistics (torch train/eval); running
  stats live in the ``batch_stats`` collection.
  """
  num_features: int
  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x: Array, y: Array, train: bool = True) -> Array:
    c = self.num_features
    h = nn.BatchNorm(use_running_average=not train, use_bias=False,
                     use_scale=False)(x)
    if self.bias:
      embed = self.param(
          "embed",
          lambda k, s: jnp.concatenate(
              [jax.random.uniform(k, (s[0], c)), jnp.zeros((s[0], c))], axis=1),
          (self.num_classes, 2 * c))
      gamma, beta = embed[y][:, :c], embed[y][:, c:]
      return gamma[:, None, None, :] * h + beta[:, None, None, :]
    embed = self.param("embed", jax.random.uniform, (self.num_classes, c))
    return embed[y][:, None, None, :] * h


class ConditionalInstanceNorm2d(nn.Module):
  """Conditional instance norm (reference normalization.py:66-89)."""
  num_features: int
  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    c = self.num_features
    h = _instance_norm(x)
    if self.bias:
      embed = self.param(
          "embed",
          lambda k, s: jnp.concatenate(
              [jax.random.uniform(k, (s[0], c)), jnp.zeros((s[0], c))], axis=1),
          (self.num_classes, 2 * c))
      gamma, beta = embed[y][:, :c], embed[y][:, c:]
      return gamma[:, None, None, :] * h + beta[:, None, None, :]
    embed = self.param("embed", jax.random.uniform, (self.num_classes, c))
    return embed[y][:, None, None, :] * h


class ConditionalVarianceNorm2d(nn.Module):
  """Conditional variance norm (reference normalization.py:92-105)."""
  num_features: int
  num_classes: int
  bias: bool = False

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    c = self.num_features
    x = x.astype(jnp.float32)
    embed = self.param("embed", _embed_scale_init, (self.num_classes, c))
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    h = x * jax.lax.rsqrt(var + 1e-5)
    return embed[y][:, None, None, :] * h


class ConditionalNoneNorm2d(nn.Module):
  """Affine-from-embedding, no normalization (reference normalization.py:124-139)."""
  num_features: int
  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    c = self.num_features
    if self.bias:
      embed = self.param(
          "embed",
          lambda k, s: jnp.concatenate(
              [jax.random.uniform(k, (s[0], c)), jnp.zeros((s[0], c))], axis=1),
          (self.num_classes, 2 * c))
      gamma, beta = embed[y][:, :c], embed[y][:, c:]
      return gamma[:, None, None, :] * x + beta[:, None, None, :]
    embed = self.param("embed", jax.random.uniform, (self.num_classes, c))
    return embed[y][:, None, None, :] * x


def get_normalization(config, conditional: bool = False):
  """Normalization constructor from config (reference normalization.py:20-38).

  Unconditional constructors take no args (`norm(name=...)`) and are applied
  as `norm()(x)`; conditional ones take (num_features, num_classes).
  """
  norm = config.model.normalization
  if conditional:
    if norm == "InstanceNorm++":
      return functools.partial(ConditionalInstanceNorm2dPlus)
    raise NotImplementedError(f"{norm} not implemented yet.")
  if norm == "InstanceNorm":
    return InstanceNorm2d
  if norm == "InstanceNorm++":
    return InstanceNorm2dPlus
  if norm == "VarianceNorm":
    return VarianceNorm2d
  if norm == "GroupNorm":
    from score_sde_pytorch_tpu.models.layers import GroupNorm
    return GroupNorm
  raise ValueError(f"Unknown normalization: {norm}")
