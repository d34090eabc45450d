"""Controllable generation: inpainting and colorization via projected PC sampling.

Rebuild of /root/reference/controllable_generation.py. TPU-native design: the
data-consistency projection is a hook applied after each predictor/corrector
update inside the same jitted `lax.scan` PC body (SURVEY.md §3.5) — no
per-step Python, no object re-construction.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from score_sde_pytorch_tpu import sampling
from score_sde_pytorch_tpu.models import utils as mutils
from score_sde_pytorch_tpu.sde import batch_mul

Array = jax.Array


def _pc_jit_kwargs(mesh, n_batch_args: int):
  """in/out shardings for a PC chain over (rng, params, batch-args...):
  rng+params replicated, every data-like argument and the samples sharded
  over the mesh's ``data`` axis (the get_pc_sampler pattern,
  sampling.py:255-261)."""
  if mesh is None:
    return {}
  from jax.sharding import NamedSharding, PartitionSpec as P
  rep = NamedSharding(mesh, P())
  data_sh = NamedSharding(mesh, P("data"))
  return dict(in_shardings=(rep, rep) + (data_sh,) * n_batch_args,
              out_shardings=data_sh)


def get_pc_inpainter(sde, model_def, predictor, corrector, inverse_scaler,
                     snr: float, n_steps: int = 1,
                     probability_flow: bool = False, continuous: bool = False,
                     denoise: bool = True, eps: float = 1e-5,
                     mesh=None) -> Callable:
  """PC inpainter (reference controllable_generation.py:8-85).

  Returns ``inpainter(rng, params, data, mask) -> images`` where ``mask`` is
  1 for known pixels. The re-projection after every update diffuses the known
  region to time t: ``x = x·(1−mask) + (mean + std·z)·mask``.

  With ``mesh`` given, inpainting is data-parallel over the mesh's ``data``
  axis (data/mask batch-sharded, params replicated) — the same SPMD layout
  as every sampler (sampling.py get_pc_sampler).
  """
  predictor = predictor or sampling._PREDICTORS["none"]
  corrector = corrector or sampling._CORRECTORS["none"]

  @functools.partial(jax.jit, **_pc_jit_kwargs(mesh, n_batch_args=2))
  def pc_inpainter(rng: Array, params, data: Array, mask: Array) -> Array:
    score_fn = mutils.get_score_fn(sde, model_def, params, train=False,
                                   continuous=continuous)
    predictor_update = predictor(sde, score_fn, probability_flow)
    corrector_update = corrector(sde, score_fn, snr, n_steps)

    def project(rng, x, x_mean, t):
      masked_data_mean, std = sde.marginal_prob(data, t)
      masked_data = masked_data_mean + batch_mul(
          std, jax.random.normal(rng, x.shape))
      x = x * (1.0 - mask) + masked_data * mask
      x_mean = x * (1.0 - mask) + masked_data_mean * mask
      return x, x_mean

    rng, prior_rng = jax.random.split(rng)
    x = data * mask + sde.prior_sampling(prior_rng, data.shape) * (1.0 - mask)
    timesteps = jnp.linspace(sde.T, eps, sde.N)

    def step(carry, t_scalar):
      rng, x, _ = carry
      t = jnp.full((data.shape[0],), t_scalar)
      rng, c_rng, cp_rng, p_rng, pp_rng = jax.random.split(rng, 5)
      x, x_mean = corrector_update(c_rng, x, t)
      x, x_mean = project(cp_rng, x, x_mean, t)
      x, x_mean = predictor_update(p_rng, x, t)
      x, x_mean = project(pp_rng, x, x_mean, t)
      return (rng, x, x_mean), None

    (rng, x, x_mean), _ = jax.lax.scan(step, (rng, x, x), timesteps)
    return inverse_scaler(x_mean if denoise else x)

  return pc_inpainter


# Orthonormal basis isolating the gray channel (reference
# controllable_generation.py:105-110); NHWC → contraction on the last axis.
_M = np.array([[5.7735014e-01, -8.1649649e-01, 4.7008697e-08],
               [5.7735026e-01, 4.0824834e-01, 7.0710671e-01],
               [5.7735026e-01, 4.0824822e-01, -7.0710683e-01]],
              dtype=np.float32)
_INV_M = np.linalg.inv(_M)


def decouple(inputs: Array) -> Array:
  """Rotate RGB into the decoupled basis (gray = channel 0)."""
  return jnp.einsum("bhwi,ij->bhwj", inputs, jnp.asarray(_M))


def couple(inputs: Array) -> Array:
  return jnp.einsum("bhwi,ij->bhwj", inputs, jnp.asarray(_INV_M))


def get_mask(image: Array) -> Array:
  """1 on the gray channel, 0 elsewhere (decoupled basis)."""
  return jnp.concatenate(
      [jnp.ones_like(image[..., :1]), jnp.zeros_like(image[..., 1:])],
      axis=-1)


def get_pc_colorizer(sde, model_def, predictor, corrector, inverse_scaler,
                     snr: float, n_steps: int = 1,
                     probability_flow: bool = False, continuous: bool = False,
                     denoise: bool = True, eps: float = 1e-5,
                     mesh=None) -> Callable:
  """PC colorizer (reference controllable_generation.py:88-181).

  ``colorizer(rng, params, gray_scale_img)``; the gray image must have equal
  R=G=B channels. ``mesh``: batch-shard the gray input and samples over the
  mesh's ``data`` axis, as in `get_pc_inpainter`.
  """
  predictor = predictor or sampling._PREDICTORS["none"]
  corrector = corrector or sampling._CORRECTORS["none"]

  @functools.partial(jax.jit, **_pc_jit_kwargs(mesh, n_batch_args=1))
  def pc_colorizer(rng: Array, params, gray_scale_img: Array) -> Array:
    score_fn = mutils.get_score_fn(sde, model_def, params, train=False,
                                   continuous=continuous)
    predictor_update = predictor(sde, score_fn, probability_flow)
    corrector_update = corrector(sde, score_fn, snr, n_steps)
    shape = gray_scale_img.shape
    mask = get_mask(gray_scale_img)

    def project(rng, x, x_mean, t):
      masked_data_mean, std = sde.marginal_prob(decouple(gray_scale_img), t)
      masked_data = masked_data_mean + batch_mul(
          std, jax.random.normal(rng, x.shape))
      x = couple(decouple(x) * (1.0 - mask) + masked_data * mask)
      x_mean = couple(decouple(x) * (1.0 - mask) + masked_data_mean * mask)
      return x, x_mean

    rng, prior_rng = jax.random.split(rng)
    x = couple(decouple(gray_scale_img) * mask
               + decouple(sde.prior_sampling(prior_rng, shape)) * (1.0 - mask))
    timesteps = jnp.linspace(sde.T, eps, sde.N)

    def step(carry, t_scalar):
      rng, x, _ = carry
      t = jnp.full((shape[0],), t_scalar)
      rng, c_rng, cp_rng, p_rng, pp_rng = jax.random.split(rng, 5)
      x, x_mean = corrector_update(c_rng, x, t)
      x, x_mean = project(cp_rng, x, x_mean, t)
      x, x_mean = predictor_update(p_rng, x, t)
      x, x_mean = project(pp_rng, x, x_mean, t)
      return (rng, x, x_mean), None

    (rng, x, x_mean), _ = jax.lax.scan(step, (rng, x, x), timesteps)
    return inverse_scaler(x_mean if denoise else x)

  return pc_colorizer
