"""Model registry, factory, and score-function adapters.

Rebuild of /root/reference/models/utils.py. The torch version returns
stateful modules wrapped in DataParallel (models/utils.py:88-94); here
`create_model` returns a pure (module_def, initial_params) pair and the
adapters return pure functions `(x, t) -> score` closing over params —
ready for jit/scan/pjit.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from score_sde_pytorch_tpu import sde as sde_lib

Array = jax.Array

_MODELS = {}


def register_model(cls=None, *, name: Optional[str] = None):
  """Decorator registry (reference models/utils.py:27-44)."""

  def _register(cls):
    local_name = cls.__name__ if name is None else name
    if local_name in _MODELS:
      raise ValueError(f"Already registered model with name: {local_name}")
    _MODELS[local_name] = cls
    return cls

  return _register if cls is None else _register(cls)


def get_model(name: str):
  return _MODELS[name]


def get_sigmas(config) -> np.ndarray:
  """Descending geometric noise ladder (reference models/utils.py:49-59)."""
  return np.exp(np.linspace(np.log(config.model.sigma_max),
                            np.log(config.model.sigma_min),
                            config.model.num_scales))


def get_ddpm_params(config) -> dict:
  """Original DDPM schedule constants (reference models/utils.py:62-83)."""
  num_diffusion_timesteps = 1000
  beta_start = config.model.beta_min / config.model.num_scales
  beta_end = config.model.beta_max / config.model.num_scales
  betas = np.linspace(beta_start, beta_end, num_diffusion_timesteps,
                      dtype=np.float64)
  alphas = 1.0 - betas
  alphas_cumprod = np.cumprod(alphas, axis=0)
  return {
      "betas": betas,
      "alphas": alphas,
      "alphas_cumprod": alphas_cumprod,
      "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
      "sqrt_1m_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
      "beta_min": beta_start * (num_diffusion_timesteps - 1),
      "beta_max": beta_end * (num_diffusion_timesteps - 1),
      "num_diffusion_timesteps": num_diffusion_timesteps,
  }


def create_model(config, rng: Array):
  """Instantiate the registered model and init its params.

  Returns ``(model_def, variables)`` where ``variables`` is the flax
  variables dict (params only — the zoo keeps no batch stats). Device
  placement/parallelism is the caller's job via sharding (SURVEY.md §2.7),
  not a DataParallel wrapper.
  """
  model_def = get_model(config.model.name)(config)
  h = w = config.data.image_size
  c = config.data.num_channels
  x = jnp.zeros((1, h, w, c), dtype=jnp.float32)
  t = jnp.ones((1,), dtype=jnp.float32)
  params_rng, dropout_rng = jax.random.split(rng)
  variables = model_def.init({"params": params_rng, "dropout": dropout_rng},
                             x, t, train=False)
  return model_def, variables


def get_model_fn(model_def, params, train: bool = False) -> Callable:
  """Raw-output model function (reference models/utils.py:97-126).

  Returns ``model_fn(x, labels, rng=None)``; ``rng`` feeds dropout when
  ``train=True``.
  """

  def model_fn(x: Array, labels: Array, rng: Optional[Array] = None) -> Array:
    variables = {"params": params} if "params" not in params else params
    if train:
      if rng is None:
        raise ValueError(
            "get_model_fn(train=True) requires an explicit dropout rng; "
            "silently reusing a fixed key would make every call's dropout "
            "mask identical.")
      return model_def.apply(variables, x, labels, train=True,
                             rngs={"dropout": rng})
    return model_def.apply(variables, x, labels, train=False)

  return model_fn


def get_score_fn(sde: sde_lib.SDE, model_def, params, train: bool = False,
                 continuous: bool = False) -> Callable:
  """Convert raw network output to a true score function
  (reference models/utils.py:129-178): handles the per-SDE time-label and
  output-scaling conventions."""
  model_fn = get_model_fn(model_def, params, train=train)

  if isinstance(sde, (sde_lib.VPSDE, sde_lib.SubVPSDE)):

    def score_fn(x: Array, t: Array, rng: Optional[Array] = None) -> Array:
      if continuous or isinstance(sde, sde_lib.SubVPSDE):
        labels = t * 999  # continuous models take t*999 as the embedding
        score = model_fn(x, labels, rng)
        std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
      else:
        labels = t * (sde.N - 1)
        score = model_fn(x, labels, rng)
        std = sde.sqrt_1m_alphas_cumprod[labels.astype(jnp.int32)]
      return sde_lib.batch_mul(-1.0 / std, score)

  elif isinstance(sde, sde_lib.VESDE):

    def score_fn(x: Array, t: Array, rng: Optional[Array] = None) -> Array:
      if continuous:
        labels = sde.marginal_prob(jnp.zeros_like(x), t)[1]
      else:
        # t=0 ↔ highest noise level for VE-trained discrete models
        labels = jnp.round((sde.T - t) * (sde.N - 1)).astype(jnp.int32)
      return model_fn(x, labels, rng)

  else:
    raise NotImplementedError(
        f"SDE class {sde.__class__.__name__} not yet supported.")

  return score_fn


def to_flattened_numpy(x) -> np.ndarray:
  """Flatten an array to 1-D numpy (reference models/utils.py:181-183).

  Kept for API parity; the on-device ODE path (score_sde_pytorch_tpu.ode)
  makes the scipy host bridge these fed unnecessary."""
  return np.asarray(x).reshape((-1,))


def from_flattened_numpy(x: np.ndarray, shape) -> jnp.ndarray:
  """Reshape a flat numpy vector to a device array (reference models/utils.py:186-188)."""
  return jnp.asarray(x).reshape(shape)
