"""Samplers: predictor–corrector (one jitted lax.scan) and probability-flow ODE.

Rebuild of /root/reference/sampling.py. Key TPU-native differences:

* Predictors/correctors are pure update functions ``(rng, x, t) -> (x, x_mean)``
  selected *statically* from the registries; the whole PC loop is ONE
  `lax.scan` inside `jax.jit` — the reference re-constructs the
  predictor/corrector objects and re-wraps score_fn every step
  (sampling.py:335-341), pure Python overhead here traced away.
* The ODE sampler integrates on-device with an adaptive Dormand–Prince RK45
  (`score_sde_pytorch_tpu.ode`) instead of bridging to scipy on the host
  per NFE (reference sampling.py:466-470 — 2 host↔device copies per NFE).
* RNG is explicitly threaded.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from score_sde_pytorch_tpu import ode as ode_lib
from score_sde_pytorch_tpu import sde as sde_lib
from score_sde_pytorch_tpu.parallel.mesh import (batch_constraint,
                                                 place_replicated)
from score_sde_pytorch_tpu.models import utils as mutils
from score_sde_pytorch_tpu.sde import batch_mul

Array = jax.Array

_PREDICTORS = {}
_CORRECTORS = {}


def register_predictor(cls=None, *, name: Optional[str] = None):
  """Decorator registry (reference sampling.py:30-49)."""

  def _register(cls):
    local_name = cls.__name__ if name is None else name
    if local_name in _PREDICTORS:
      raise ValueError(f"Already registered predictor with name: {local_name}")
    _PREDICTORS[local_name] = cls
    return cls

  return _register if cls is None else _register(cls)


def register_corrector(cls=None, *, name: Optional[str] = None):

  def _register(cls):
    local_name = cls.__name__ if name is None else name
    if local_name in _CORRECTORS:
      raise ValueError(f"Already registered corrector with name: {local_name}")
    _CORRECTORS[local_name] = cls
    return cls

  return _register if cls is None else _register(cls)


def get_predictor(name: str):
  return _PREDICTORS[name]


def get_corrector(name: str):
  return _CORRECTORS[name]


# ---------------------------------------------------------------------------
# Predictors: factories returning pure update fns (rng, x, t) -> (x, x_mean)
# ---------------------------------------------------------------------------


@register_predictor(name="euler_maruyama")
def euler_maruyama_predictor(sde, score_fn, probability_flow=False):
  """Reference sampling.py:176-187."""
  rsde = sde.reverse(score_fn, probability_flow)

  def update_fn(rng, x, t):
    dt = -1.0 / rsde.N
    z = jax.random.normal(rng, x.shape)
    drift, diffusion = rsde.sde(x, t)
    x_mean = x + drift * dt
    x = x_mean + batch_mul(diffusion, math.sqrt(-dt) * z)
    return x, x_mean

  return update_fn


@register_predictor(name="reverse_diffusion")
def reverse_diffusion_predictor(sde, score_fn, probability_flow=False):
  """Reference sampling.py:190-200."""
  rsde = sde.reverse(score_fn, probability_flow)

  def update_fn(rng, x, t):
    f, g = rsde.discretize(x, t)
    z = jax.random.normal(rng, x.shape)
    x_mean = x - f
    x = x_mean + batch_mul(g, z)
    return x, x_mean

  return update_fn


@register_predictor(name="ancestral_sampling")
def ancestral_sampling_predictor(sde, score_fn, probability_flow=False):
  """Exact SMLD/DDPM ancestral rules (reference sampling.py:203-239)."""
  assert not probability_flow, \
      "Probability flow not supported by ancestral sampling"
  if isinstance(sde, sde_lib.VESDE):

    def update_fn(rng, x, t):
      timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
      sigma = sde.discrete_sigmas[timestep]
      adjacent_sigma = jnp.where(
          timestep == 0, jnp.zeros_like(sigma),
          sde.discrete_sigmas[jnp.maximum(timestep - 1, 0)])
      score = score_fn(x, t)
      x_mean = x + batch_mul(sigma ** 2 - adjacent_sigma ** 2, score)
      std = jnp.sqrt(adjacent_sigma ** 2 * (sigma ** 2 - adjacent_sigma ** 2)
                     / sigma ** 2)
      noise = jax.random.normal(rng, x.shape)
      return x_mean + batch_mul(std, noise), x_mean

    return update_fn
  elif isinstance(sde, sde_lib.VPSDE):

    def update_fn(rng, x, t):
      timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
      beta = sde.discrete_betas[timestep]
      score = score_fn(x, t)
      x_mean = batch_mul(1.0 / jnp.sqrt(1.0 - beta), x + batch_mul(beta, score))
      noise = jax.random.normal(rng, x.shape)
      return x_mean + batch_mul(jnp.sqrt(beta), noise), x_mean

    return update_fn
  raise NotImplementedError(
      f"SDE class {sde.__class__.__name__} not yet supported.")


@register_predictor(name="none")
def none_predictor(sde, score_fn, probability_flow=False):
  """Reference sampling.py:242-250."""

  def update_fn(rng, x, t):
    return x, x

  return update_fn


# ---------------------------------------------------------------------------
# Correctors
# ---------------------------------------------------------------------------


def _corrector_alpha(sde, t):
  if isinstance(sde, (sde_lib.VPSDE, sde_lib.SubVPSDE)):
    timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
    return sde.alphas[timestep]
  return jnp.ones_like(t)


@register_corrector(name="langevin")
def langevin_corrector(sde, score_fn, snr, n_steps):
  """Step size 2·alpha·(snr·‖noise‖/‖grad‖)² (reference sampling.py:253-282)."""
  if not isinstance(sde, (sde_lib.VPSDE, sde_lib.VESDE, sde_lib.SubVPSDE)):
    raise NotImplementedError(
        f"SDE class {sde.__class__.__name__} not yet supported.")

  def update_fn(rng, x, t):
    alpha = _corrector_alpha(sde, t)

    def one_step(carry, step_rng):
      x, _ = carry
      grad = score_fn(x, t)
      noise = jax.random.normal(step_rng, x.shape)
      grad_norm = jnp.mean(
          jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1))
      noise_norm = jnp.mean(
          jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1))
      step_size = (snr * noise_norm / grad_norm) ** 2 * 2 * alpha
      x_mean = x + batch_mul(step_size, grad)
      x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
      return (x, x_mean), None

    (x, x_mean), _ = jax.lax.scan(one_step, (x, x),
                                  jax.random.split(rng, n_steps))
    return x, x_mean

  return update_fn


@register_corrector(name="ald")
def annealed_langevin_dynamics(sde, score_fn, snr, n_steps):
  """Original NCSN annealed Langevin; step 2·alpha·(snr·std)²
  (reference sampling.py:285-319)."""
  if not isinstance(sde, (sde_lib.VPSDE, sde_lib.VESDE, sde_lib.SubVPSDE)):
    raise NotImplementedError(
        f"SDE class {sde.__class__.__name__} not yet supported.")

  def update_fn(rng, x, t):
    alpha = _corrector_alpha(sde, t)
    std = sde.marginal_prob(x, t)[1]
    step_size = (snr * std) ** 2 * 2 * alpha

    def one_step(carry, step_rng):
      x, _ = carry
      grad = score_fn(x, t)
      noise = jax.random.normal(step_rng, x.shape)
      x_mean = x + batch_mul(step_size, grad)
      x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
      return (x, x_mean), None

    (x, x_mean), _ = jax.lax.scan(one_step, (x, x),
                                  jax.random.split(rng, n_steps))
    return x, x_mean

  return update_fn


@register_corrector(name="none")
def none_corrector(sde, score_fn, snr, n_steps):
  """Reference sampling.py:322-330."""

  def update_fn(rng, x, t):
    return x, x

  return update_fn


# ---------------------------------------------------------------------------
# PC sampler — one jitted lax.scan (reference sampling.py:355-411)
# ---------------------------------------------------------------------------


def get_pc_sampler(sde, model_def, shape, predictor, corrector,
                   inverse_scaler, snr, n_steps: int = 1,
                   probability_flow: bool = False, continuous: bool = False,
                   denoise: bool = True, eps: float = 1e-3, mesh=None):
  """Predictor–corrector sampler.

  Returns ``sampler(rng, params) -> (samples, nfe)``; the full N-step loop
  is one compiled scan. ``predictor``/``corrector`` are the factory callables
  from the registries (or None → the respective "none" entry).

  With ``mesh`` given, sample generation is data-parallel: the batch axis of
  the returned samples is sharded over the mesh's ``data`` axis (params
  replicated, XLA partitions the whole scanned chain) — the sharded
  sample-generation mode of the eval pipeline (SURVEY.md §7 step 9).
  """
  predictor = predictor or _PREDICTORS["none"]
  corrector = corrector or _CORRECTORS["none"]

  jit_kwargs = {}
  if mesh is not None:
    from jax.sharding import NamedSharding, PartitionSpec as P
    jit_kwargs = dict(
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
        out_shardings=(NamedSharding(mesh, P("data")),
                       NamedSharding(mesh, P())))

  @functools.partial(jax.jit, **jit_kwargs)
  def pc_sampler(rng, params):
    score_fn = mutils.get_score_fn(sde, model_def, params, train=False,
                                   continuous=continuous)
    predictor_update = predictor(sde, score_fn, probability_flow)
    corrector_update = corrector(sde, score_fn, snr, n_steps)
    rng, prior_rng = jax.random.split(rng)
    x = sde.prior_sampling(prior_rng, shape)
    timesteps = jnp.linspace(sde.T, eps, sde.N)

    def step(carry, t_scalar):
      rng, x, _ = carry
      rng, c_rng, p_rng = jax.random.split(rng, 3)
      t = jnp.full((shape[0],), t_scalar)
      x, x_mean = corrector_update(c_rng, x, t)
      x, x_mean = predictor_update(p_rng, x, t)
      return (rng, x, x_mean), None

    (rng, x, x_mean), _ = jax.lax.scan(step, (rng, x, x), timesteps)
    out = inverse_scaler(x_mean if denoise else x)
    return out, jnp.asarray(sde.N * (n_steps + 1))

  return pc_sampler


def get_ode_sampler(sde, model_def, shape, inverse_scaler,
                    denoise: bool = False, rtol: float = 1e-5,
                    atol: float = 1e-5, eps: float = 1e-3,
                    max_steps: int = 10000, mesh=None):
  """Probability-flow ODE sampler with on-device RK45
  (reference sampling.py:414-485; scipy bridge replaced by
  `ode_lib.odeint_rk45` under jit — no host round-trips).

  With ``mesh`` given, the sample batch is sharded over the mesh's ``data``
  axis for the whole integration (params replicated)."""
  constrain = batch_constraint(mesh)

  @jax.jit
  def ode_sampler(rng, params, z: Optional[Array] = None):
    score_fn = mutils.get_score_fn(sde, model_def, params, train=False,
                                   continuous=True)
    rsde = sde.reverse(score_fn, probability_flow=True)

    rng, prior_rng = jax.random.split(rng)
    x0 = sde.prior_sampling(prior_rng, shape) if z is None else z
    x0 = constrain(x0)

    def drift_fn(x, t_scalar):
      t = jnp.full((shape[0],), t_scalar)
      return rsde.sde(x, t)[0]

    x, nfe, status = ode_lib.odeint_rk45(drift_fn, x0, sde.T, eps, rtol=rtol,
                                         atol=atol, max_steps=max_steps)
    # scipy (the reference, sampling.py:466-473) raises on non-convergence;
    # under jit we flag it by NaN-ing the samples instead of returning a
    # plausible-looking unfinished trajectory.
    x = jnp.where(status == ode_lib.STATUS_OK, x, jnp.nan)
    if denoise:
      # One reverse-diffusion step at eps (reference sampling.py:435-441).
      rng, d_rng = jax.random.split(rng)
      rd = reverse_diffusion_predictor(sde, score_fn, probability_flow=False)
      t = jnp.full((shape[0],), eps)
      _, x = rd(d_rng, x, t)
      nfe = nfe + 1
    return inverse_scaler(x), nfe

  if mesh is None:
    return ode_sampler

  def placed_ode_sampler(rng, params, z: Optional[Array] = None):
    rng, params, z = place_replicated(mesh, rng, params, z)
    return ode_sampler(rng, params, z)
  return placed_ode_sampler


def get_heun_sampler(sde, model_def, shape, inverse_scaler,
                     n_steps: int = 50, denoise: bool = True,
                     continuous: bool = True, eps: float = 1e-3, mesh=None):
  """Deterministic 2nd-order Heun probability-flow sampler.

  Beyond-reference extension (cf. EDM / UniPC-style fast samplers,
  PAPERS.md): integrates the probability-flow ODE with Heun's method on a
  fixed time grid — 2 NFE per step, typically matching 1000-step EM quality
  at ~50 steps. One jitted `lax.scan`. ``mesh``: as in `get_ode_sampler`.
  """
  constrain = batch_constraint(mesh)

  @jax.jit
  def heun_sampler(rng, params):
    score_fn = mutils.get_score_fn(sde, model_def, params, train=False,
                                   continuous=continuous)
    rsde = sde.reverse(score_fn, probability_flow=True)

    def drift(x, t):
      return rsde.sde(x, t)[0]

    rng, prior_rng = jax.random.split(rng)
    x = constrain(sde.prior_sampling(prior_rng, shape))
    ts = jnp.linspace(sde.T, eps, n_steps + 1)

    def step(x, idx):
      t0, t1 = ts[idx], ts[idx + 1]
      dt = t1 - t0
      vt0 = jnp.full((shape[0],), t0)
      vt1 = jnp.full((shape[0],), t1)
      d0 = drift(x, vt0)
      x_euler = x + dt * d0
      d1 = drift(x_euler, vt1)
      return x + dt * 0.5 * (d0 + d1), None

    x, _ = jax.lax.scan(step, x, jnp.arange(n_steps))
    nfe = 2 * n_steps
    if denoise:
      # final Tweedie-style denoise at eps: x + std^2 * score
      t = jnp.full((shape[0],), eps)
      _, std = sde.marginal_prob(jnp.zeros_like(x), t)
      x = x + batch_mul(std ** 2, score_fn(x, t))
      nfe += 1
    return inverse_scaler(x), nfe

  if mesh is None:
    return heun_sampler

  def placed_heun_sampler(rng, params):
    return heun_sampler(*place_replicated(mesh, rng, params))
  return placed_heun_sampler


def get_dpmpp_sampler(sde, model_def, shape, inverse_scaler,
                      n_steps: int = 20, denoise: bool = False,
                      continuous: bool = True, eps: float = 1e-3,
                      stochastic: bool = False, mesh=None):
  """DPM-Solver++(2M): multistep 2nd-order fast sampler, 1 NFE/step.

  Beyond-reference extension (Lu et al. 2022, PAPERS.md): integrates the
  probability-flow ODE in half-log-SNR time λ = log(α/σ) with the
  data-prediction parametrization — the linear (noise-scaling) part of the
  reverse dynamics is solved EXACTLY and only the data prediction
  x0(x,t) = (x + σ²·score)/α is extrapolated, so 1 NFE per step suffices
  (vs heun's 2) and ~20 steps match the 100-NFE heun chain. One jitted
  `lax.scan`. Generic over any SDE whose perturbation kernel is
  x_t = α(t)·x0 + σ(t)·ε (VE: α=1; VP/subVP via marginal_prob).

  ``stochastic=True`` selects SDE-DPM-Solver++(2M): the same multistep
  data-prediction D, but the exact solution of the reverse *SDE* instead
  of the ODE — the linear part contracts twice as fast (e^{-h} on x,
  1−e^{-2h} on D) and fresh noise σ_{i+1}·√(1−e^{-2h})·ε is injected each
  step. Still 1 NFE/step. The injected noise plays the role of the PC
  chain's Langevin churn: it restores the stochastic mixing that the
  deterministic prob-flow samplers lack (the measured mixture mode-balance
  failure of heun/dpmpp — see tests/test_learning.py and PARITY.md).

  ``mesh``: as in `get_ode_sampler` (batch sharded over the data axis).
  """
  constrain = batch_constraint(mesh)

  @jax.jit
  def dpmpp_sampler(rng, params):
    score_fn = mutils.get_score_fn(sde, model_def, params, train=False,
                                   continuous=continuous)
    ts = jnp.linspace(sde.T, eps, n_steps + 1)

    def coeff(t_scalar):
      mean, std = sde.marginal_prob(jnp.ones((1, 1, 1, 1)),
                                    jnp.full((1,), t_scalar))
      return mean[0, 0, 0, 0], std[0]

    alphas, sigmas = jax.vmap(coeff)(ts)
    lams = jnp.log(alphas) - jnp.log(sigmas)

    def x0_pred(x, i):
      t = jnp.full((shape[0],), ts[i])
      return (x + sigmas[i] ** 2 * score_fn(x, t)) / alphas[i]

    rng, prior_rng = jax.random.split(rng)
    x = constrain(sde.prior_sampling(prior_rng, shape))
    step_rngs = jax.random.split(rng, n_steps)

    def step(carry, inp):
      i, step_rng = inp
      x, prev_x0 = carry
      h = lams[i + 1] - lams[i]
      h_prev = lams[i] - lams[jnp.maximum(i - 1, 0)]
      x0 = x0_pred(x, i)
      # 2nd-order multistep correction from the previous x0 prediction;
      # first step (no history, h_prev == 0) falls back to 1st order.
      r = jnp.where(i > 0, h_prev / h, 1.0)
      D = jnp.where(i > 0,
                    (1.0 + 1.0 / (2.0 * r)) * x0 - prev_x0 / (2.0 * r),
                    x0)
      if stochastic:
        noise = constrain(jax.random.normal(step_rng, shape))
        x = (sigmas[i + 1] / sigmas[i]) * jnp.exp(-h) * x \
            - alphas[i + 1] * jnp.expm1(-2.0 * h) * D \
            + sigmas[i + 1] * jnp.sqrt(-jnp.expm1(-2.0 * h)) * noise
      else:
        x = (sigmas[i + 1] / sigmas[i]) * x \
            - alphas[i + 1] * jnp.expm1(-h) * D
      return (x, x0), None

    (x, _), _ = jax.lax.scan(step, (x, x),
                             (jnp.arange(n_steps), step_rngs))
    nfe = n_steps
    if denoise:
      # final data prediction at eps (Tweedie; cf. heun's denoise tail)
      x = x0_pred(x, n_steps)
      nfe += 1
    return inverse_scaler(x), nfe

  if mesh is None:
    return dpmpp_sampler

  def placed_dpmpp_sampler(rng, params):
    return dpmpp_sampler(*place_replicated(mesh, rng, params))
  return placed_dpmpp_sampler


def get_sampling_fn(config, sde, model_def, shape, inverse_scaler,
                    eps: Optional[float] = None, mesh=None):
  """Dispatcher on config.sampling.method (reference sampling.py:80-123,
  plus the TPU-native 'heun' and 'dpmpp' fast samplers).

  Returns ``sampling_fn(rng, params) -> (samples, nfe)``. ``eps`` defaults
  to the per-SDE sampling_eps (reference run_lib.py:90-100: 1e-3 VP/subVP,
  1e-5 VE), overridable via ``config.sampling.eps``; ODE tolerances come
  from ``config.sampling.{rtol,atol}``. With ``mesh``, every sampler shards
  the sample batch over the mesh's ``data`` axis.
  """
  if eps is None:
    eps = sde_lib.sampling_eps(config)
  sampler_name = config.sampling.method
  if sampler_name.lower() == "ode":
    return get_ode_sampler(sde, model_def, shape, inverse_scaler,
                           denoise=config.sampling.noise_removal,
                           rtol=config.sampling.get("rtol", 1e-5),
                           atol=config.sampling.get("atol", 1e-5), eps=eps,
                           max_steps=config.sampling.get("ode_max_steps",
                                                         10000),
                           mesh=mesh)
  elif sampler_name.lower() == "heun":
    return get_heun_sampler(
        sde, model_def, shape, inverse_scaler,
        n_steps=config.sampling.get("heun_steps", 50),
        denoise=config.sampling.noise_removal,
        continuous=config.training.continuous, eps=eps, mesh=mesh)
  elif sampler_name.lower() == "dpmpp":
    return get_dpmpp_sampler(
        sde, model_def, shape, inverse_scaler,
        n_steps=config.sampling.get("dpmpp_steps", 20),
        denoise=config.sampling.noise_removal,
        continuous=config.training.continuous, eps=eps,
        stochastic=config.sampling.get("dpmpp_stochastic", False),
        mesh=mesh)
  elif sampler_name.lower() == "pc":
    predictor = get_predictor(config.sampling.predictor.lower())
    corrector = get_corrector(config.sampling.corrector.lower())
    return get_pc_sampler(
        sde, model_def, shape, predictor, corrector, inverse_scaler,
        snr=config.sampling.snr, n_steps=config.sampling.n_steps_each,
        probability_flow=config.sampling.probability_flow,
        continuous=config.training.continuous,
        denoise=config.sampling.noise_removal, eps=eps, mesh=mesh)
  raise ValueError(f"Sampler name {sampler_name} unknown.")
