"""SDE core: forward/reverse stochastic differential equations, pure JAX.

TPU-native rebuild of the reference's ``sde_lib.py`` (see
/root/reference/sde_lib.py:7-254). Design differences from the reference:

* SDEs are immutable dataclasses whose fields are Python floats/ints, so they
  are *static* w.r.t. ``jax.jit`` — every method is a pure ``jnp`` function of
  its array arguments and traces cleanly into ``lax.scan`` bodies.
* ``prior_sampling`` takes an explicit PRNG key (threaded-key discipline
  instead of torch's global RNG).
* ``reverse`` returns a lightweight ``ReverseSDE`` value object rather than
  dynamically synthesising a subclass (reference ``sde_lib.py:71-109``).
* All shapes are NHWC and time ``t`` is a rank-1 batch vector; broadcasting to
  image rank is centralised in :func:`batch_mul`.
"""
from __future__ import annotations

import abc
import dataclasses
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def batch_mul(a: Array, b: Array) -> Array:
  """Multiply a batch vector ``a`` (shape ``[B]``) onto ``b`` (``[B, ...]``)."""
  return a.reshape(a.shape + (1,) * (b.ndim - a.ndim)) * b


class SDE(abc.ABC):
  """Abstract forward SDE ``dx = f(x,t) dt + g(t) dW`` on t ∈ [0, T].

  Mirrors the capability surface of reference ``sde_lib.SDE``
  (/root/reference/sde_lib.py:7-69): drift/diffusion, perturbation-kernel
  marginals, prior sampling/log-density, and an Euler–Maruyama default
  discretization.
  """

  N: int  # number of discretization steps

  @property
  @abc.abstractmethod
  def T(self) -> float:
    """End time of the SDE."""

  @abc.abstractmethod
  def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
    """Drift ``f(x,t)`` and diffusion ``g(t)`` (diffusion shape ``[B]``)."""

  @abc.abstractmethod
  def marginal_prob(self, x: Array, t: Array) -> Tuple[Array, Array]:
    """Mean and std of the perturbation kernel ``p_t(x(t) | x(0))``."""

  @abc.abstractmethod
  def prior_sampling(self, rng: Array, shape: Tuple[int, ...]) -> Array:
    """Sample from the prior ``p_T``."""

  @abc.abstractmethod
  def prior_logp(self, z: Array) -> Array:
    """Log-density of the prior at ``z``; shape ``[B]``."""

  def discretize(self, x: Array, t: Array) -> Tuple[Array, Array]:
    """One-step Euler–Maruyama discretization ``x_{i+1} = x_i + f + G z``.

    Returns ``f = drift * dt`` and ``G = diffusion * sqrt(dt)`` (reference
    ``sde_lib.py:55-69``).
    """
    dt = self.T / self.N
    drift, diffusion = self.sde(x, t)
    f = drift * dt
    g = diffusion * jnp.sqrt(dt)
    return f, g

  def reverse(self, score_fn: Callable[[Array, Array], Array],
              probability_flow: bool = False) -> "ReverseSDE":
    """Reverse-time SDE / probability-flow ODE (reference ``sde_lib.py:71-109``)."""
    return ReverseSDE(self, score_fn, probability_flow)


@dataclasses.dataclass(frozen=True)
class ReverseSDE:
  """Reverse-time SDE built from a forward SDE and a score function.

  ``dx = [f(x,t) - g(t)^2 * score(x,t) * (0.5 if ODE else 1)] dt + g dW``,
  with ``g = 0`` for the probability-flow ODE.
  """
  fwd: SDE
  score_fn: Callable[[Array, Array], Array]
  probability_flow: bool = False

  @property
  def T(self) -> float:
    return self.fwd.T

  @property
  def N(self) -> int:
    return self.fwd.N

  def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
    drift, diffusion = self.fwd.sde(x, t)
    score = self.score_fn(x, t)
    factor = 0.5 if self.probability_flow else 1.0
    drift = drift - batch_mul(diffusion ** 2, score) * factor
    diffusion = jnp.zeros_like(diffusion) if self.probability_flow else diffusion
    return drift, diffusion

  def discretize(self, x: Array, t: Array) -> Tuple[Array, Array]:
    """Reverse discretization for discrete-step predictors."""
    f, g = self.fwd.discretize(x, t)
    factor = 0.5 if self.probability_flow else 1.0
    rev_f = f - batch_mul(g ** 2, self.score_fn(x, t)) * factor
    rev_g = jnp.zeros_like(g) if self.probability_flow else g
    return rev_f, rev_g


def _check_discrete_betas_valid(sde) -> None:
  """Loud trace-time guard for the discrete DDPM buffers.

  The grid is ``linspace(beta_min/N, beta_max/N, N)``; with ``N <= beta_max``
  the last betas exceed 1, alphas go negative, and every discrete rule
  (reverse-diffusion discretize, ancestral sampling, Langevin/ALD step
  sizes) silently returns NaN — a footgun the reference shares (it only
  ever runs N=1000). Raising here (properties evaluate at trace time, not
  inside compiled code) errors exactly when a discrete-buffer consumer is
  built; purely continuous use at tiny N stays legal.
  """
  if sde.beta_max / sde.N >= 1.0:
    raise ValueError(
        f"{type(sde).__name__}(N={sde.N}, beta_max={sde.beta_max}): discrete "
        f"betas reach {sde.beta_max / sde.N:.3g} >= 1, so alphas go negative "
        "and every discrete sampling rule produces NaN. Use "
        f"num_scales > beta_max (= {sde.beta_max:g}) for VP/subVP.")


@dataclasses.dataclass(frozen=True)
class VPSDE(SDE):
  """Variance-preserving SDE (DDPM); reference ``sde_lib.py:112-164``.

  ``dx = -0.5 beta(t) x dt + sqrt(beta(t)) dW`` with beta linear in t.
  """
  beta_min: float = 0.1
  beta_max: float = 20.0
  N: int = 1000

  @property
  def T(self) -> float:
    return 1.0

  # Discrete DDPM buffers (computed lazily, pure numpy-free jnp).
  @property
  def discrete_betas(self) -> Array:
    _check_discrete_betas_valid(self)
    return jnp.linspace(self.beta_min / self.N, self.beta_max / self.N, self.N)

  @property
  def alphas(self) -> Array:
    return 1.0 - self.discrete_betas

  @property
  def alphas_cumprod(self) -> Array:
    return jnp.cumprod(self.alphas)

  @property
  def sqrt_alphas_cumprod(self) -> Array:
    return jnp.sqrt(self.alphas_cumprod)

  @property
  def sqrt_1m_alphas_cumprod(self) -> Array:
    return jnp.sqrt(1.0 - self.alphas_cumprod)

  def beta_t(self, t: Array) -> Array:
    return self.beta_min + t * (self.beta_max - self.beta_min)

  def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
    beta_t = self.beta_t(t)
    drift = -0.5 * batch_mul(beta_t, x)
    diffusion = jnp.sqrt(beta_t)
    return drift, diffusion

  def _log_mean_coeff(self, t: Array) -> Array:
    return -0.25 * t ** 2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min

  def marginal_prob(self, x: Array, t: Array) -> Tuple[Array, Array]:
    log_mean_coeff = self._log_mean_coeff(t)
    mean = batch_mul(jnp.exp(log_mean_coeff), x)
    std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
    return mean, std

  def prior_sampling(self, rng: Array, shape: Tuple[int, ...]) -> Array:
    return jax.random.normal(rng, shape)

  def prior_logp(self, z: Array) -> Array:
    shape = z.shape
    n = math.prod(shape[1:])
    return -n / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(
        z.reshape(shape[0], -1) ** 2, axis=-1) / 2.0

  def discretize(self, x: Array, t: Array) -> Tuple[Array, Array]:
    """DDPM discretization: ``f = (sqrt(alpha_i) - 1) x``, ``G = sqrt(beta_i)``."""
    timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
    beta = self.discrete_betas[timestep]
    alpha = self.alphas[timestep]
    sqrt_beta = jnp.sqrt(beta)
    f = batch_mul(jnp.sqrt(alpha), x) - x
    return f, sqrt_beta


@dataclasses.dataclass(frozen=True)
class SubVPSDE(SDE):
  """Sub-variance-preserving SDE; reference ``sde_lib.py:167-204``.

  Unlike the reference, we also define the discrete DDPM buffers
  (``discrete_betas``/``alphas`` — same linear beta schedule as VP): the
  Langevin/ALD correctors read ``sde.alphas`` for both VP *and* subVP
  (reference ``sampling.py:261-265,300-306`` explicitly accepts subVPSDE
  there), but the reference's ``subVPSDE`` never defines them, so its
  corrector path crashes with AttributeError. Defining them realizes the
  reference's documented intent.
  """
  beta_min: float = 0.1
  beta_max: float = 20.0
  N: int = 1000

  @property
  def T(self) -> float:
    return 1.0

  @property
  def discrete_betas(self) -> Array:
    _check_discrete_betas_valid(self)
    return jnp.linspace(self.beta_min / self.N, self.beta_max / self.N, self.N)

  @property
  def alphas(self) -> Array:
    return 1.0 - self.discrete_betas

  def beta_t(self, t: Array) -> Array:
    return self.beta_min + t * (self.beta_max - self.beta_min)

  def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
    beta_t = self.beta_t(t)
    drift = -0.5 * batch_mul(beta_t, x)
    discount = 1.0 - jnp.exp(
        -2.0 * self.beta_min * t - (self.beta_max - self.beta_min) * t ** 2)
    diffusion = jnp.sqrt(beta_t * discount)
    return drift, diffusion

  def marginal_prob(self, x: Array, t: Array) -> Tuple[Array, Array]:
    log_mean_coeff = (-0.25 * t ** 2 * (self.beta_max - self.beta_min)
                      - 0.5 * t * self.beta_min)
    mean = batch_mul(jnp.exp(log_mean_coeff), x)
    std = 1.0 - jnp.exp(2.0 * log_mean_coeff)
    return mean, std

  def prior_sampling(self, rng: Array, shape: Tuple[int, ...]) -> Array:
    return jax.random.normal(rng, shape)

  def prior_logp(self, z: Array) -> Array:
    shape = z.shape
    n = math.prod(shape[1:])
    return -n / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(
        z.reshape(shape[0], -1) ** 2, axis=-1) / 2.0


@dataclasses.dataclass(frozen=True)
class VESDE(SDE):
  """Variance-exploding SDE (SMLD); reference ``sde_lib.py:207-254``.

  Zero drift; ``sigma(t) = sigma_min (sigma_max/sigma_min)^t``.
  """
  sigma_min: float = 0.01
  sigma_max: float = 50.0
  N: int = 1000

  @property
  def T(self) -> float:
    return 1.0

  @property
  def discrete_sigmas(self) -> Array:
    """Geometric noise ladder (ascending), used by SMLD discretization."""
    return jnp.exp(jnp.linspace(jnp.log(self.sigma_min),
                                jnp.log(self.sigma_max), self.N))

  def sigma_t(self, t: Array) -> Array:
    return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

  def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
    sigma = self.sigma_t(t)
    drift = jnp.zeros_like(x)
    diffusion = sigma * jnp.sqrt(
        2.0 * (jnp.log(self.sigma_max) - jnp.log(self.sigma_min)))
    return drift, diffusion

  def marginal_prob(self, x: Array, t: Array) -> Tuple[Array, Array]:
    return x, self.sigma_t(t)

  def prior_sampling(self, rng: Array, shape: Tuple[int, ...]) -> Array:
    return jax.random.normal(rng, shape) * self.sigma_max

  def prior_logp(self, z: Array) -> Array:
    shape = z.shape
    n = math.prod(shape[1:])
    return (-n / 2.0 * jnp.log(2 * jnp.pi * self.sigma_max ** 2)
            - jnp.sum(z.reshape(shape[0], -1) ** 2, axis=-1)
            / (2.0 * self.sigma_max ** 2))

  def discretize(self, x: Array, t: Array) -> Tuple[Array, Array]:
    """SMLD ancestral discretization: ``G = sqrt(sigma_i^2 - sigma_{i-1}^2)``."""
    timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
    sigma = self.discrete_sigmas[timestep]
    adjacent_sigma = jnp.where(timestep == 0, jnp.zeros_like(sigma),
                               self.discrete_sigmas[jnp.maximum(timestep - 1, 0)])
    f = jnp.zeros_like(x)
    g = jnp.sqrt(sigma ** 2 - adjacent_sigma ** 2)
    return f, g


def sampling_eps(config) -> float:
  """Smallest integration time for samplers (reference run_lib.py:90-100:
  1e-3 for VP/subVP, 1e-5 for VE). ``config.sampling.eps > 0`` overrides."""
  if "sampling" in config:
    eps = config.sampling.get("eps", -1.0)
    if eps is not None and eps > 0:
      return float(eps)
  return 1e-5 if config.training.sde.lower() == "vesde" else 1e-3


def build_sde(config):
  """Construct the SDE named in ``config.training.sde`` (reference ``run_lib.py:90-100``)."""
  name = config.training.sde.lower()
  if name == "vpsde":
    return VPSDE(beta_min=config.model.beta_min, beta_max=config.model.beta_max,
                 N=config.model.num_scales)
  elif name == "subvpsde":
    return SubVPSDE(beta_min=config.model.beta_min, beta_max=config.model.beta_max,
                    N=config.model.num_scales)
  elif name == "vesde":
    return VESDE(sigma_min=config.model.sigma_min, sigma_max=config.model.sigma_max,
                 N=config.model.num_scales)
  raise NotImplementedError(f"SDE {name} unknown.")
