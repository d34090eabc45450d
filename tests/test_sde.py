"""Unit tests for the SDE core against closed forms (SURVEY.md §4(a))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_sde_pytorch_tpu import sde as sde_lib


SDES = {
    "vp": sde_lib.VPSDE(beta_min=0.1, beta_max=20.0, N=100),
    "subvp": sde_lib.SubVPSDE(beta_min=0.1, beta_max=20.0, N=100),
    "ve": sde_lib.VESDE(sigma_min=0.01, sigma_max=50.0, N=100),
}


@pytest.fixture(params=list(SDES))
def any_sde(request):
  return SDES[request.param]


def _batch(rng_seed=0, b=4, hw=8, c=3):
  rng = np.random.default_rng(rng_seed)
  return jnp.asarray(rng.normal(size=(b, hw, hw, c)), dtype=jnp.float32)


def test_vp_marginal_closed_form():
  s = SDES["vp"]
  x = _batch()
  t = jnp.array([0.0, 0.25, 0.5, 1.0])
  mean, std = s.marginal_prob(x, t)
  # Closed form: log-mean-coeff = -t^2 (b1-b0)/4 - t b0/2
  lmc = -(t ** 2) * (20.0 - 0.1) / 4 - t * 0.1 / 2
  np.testing.assert_allclose(np.asarray(std), np.sqrt(1 - np.exp(2 * np.asarray(lmc))), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(mean[0]), np.asarray(x[0]) * np.exp(lmc[0]), rtol=1e-5)
  # At t=0 the kernel is (nearly) the identity.
  np.testing.assert_allclose(np.asarray(mean[0]), np.asarray(x[0]), rtol=1e-5)
  assert float(std[0]) == pytest.approx(0.0, abs=1e-6)


def test_ve_marginal_is_geometric():
  s = SDES["ve"]
  x = _batch()
  t = jnp.array([0.0, 0.5, 1.0, 0.75])
  mean, std = s.marginal_prob(x, t)
  np.testing.assert_allclose(np.asarray(mean), np.asarray(x))
  np.testing.assert_allclose(
      np.asarray(std), 0.01 * (50.0 / 0.01) ** np.asarray(t), rtol=1e-5)


def test_subvp_std_smaller_than_vp():
  x = _batch()
  t = jnp.linspace(0.01, 1.0, 4)
  _, std_vp = SDES["vp"].marginal_prob(x, t)
  _, std_sub = SDES["subvp"].marginal_prob(x, t)
  assert np.all(np.asarray(std_sub) <= np.asarray(std_vp) + 1e-6)


def test_prior_logp_matches_gaussian(any_sde):
  z = _batch(b=2)
  logp = any_sde.prior_logp(z)
  n = np.prod(z.shape[1:])
  if isinstance(any_sde, sde_lib.VESDE):
    var = any_sde.sigma_max ** 2
  else:
    var = 1.0
  expected = (-n / 2 * np.log(2 * np.pi * var)
              - np.asarray((z.reshape(2, -1) ** 2).sum(-1)) / (2 * var))
  np.testing.assert_allclose(np.asarray(logp), expected, rtol=1e-4)


def test_prior_sampling_statistics(any_sde):
  rng = jax.random.PRNGKey(0)
  z = any_sde.prior_sampling(rng, (512, 4, 4, 3))
  target_std = any_sde.sigma_max if isinstance(any_sde, sde_lib.VESDE) else 1.0
  assert float(jnp.std(z)) == pytest.approx(target_std, rel=0.05)
  assert float(jnp.mean(z)) == pytest.approx(0.0, abs=0.05 * target_std)


@pytest.mark.parametrize("name", ["vp", "ve"])
def test_marginal_consistent_with_sde_variance(name):
  """Tie `sde()` to `marginal_prob()` through the variance solution.

  The linear-drift forward SDEs here satisfy
  ``Var(t) = m(t)^2 * integral_0^t g(s)^2 / m(s)^2 ds`` for x0 = 0, where
  ``m(t)`` is the perturbation-kernel mean coefficient. (subVP's reported
  "std" is a deliberate non-sqrt quantity — reference sde_lib.py:198 — so it
  is excluded; its `sde()` diffusion is checked in its own paper-formula test.)
  """
  any_sde = SDES[name]
  ts = jnp.linspace(1e-5, 1.0, 20001)
  x0 = jnp.zeros((ts.shape[0], 1, 1, 1))
  ones = jnp.ones_like(x0)
  _, g = any_sde.sde(x0, ts)
  m, std_true = any_sde.marginal_prob(ones, ts)
  m = np.asarray(m)[:, 0, 0, 0]
  g = np.asarray(g)
  integrand = g ** 2 / m ** 2
  dt = float(ts[1] - ts[0])
  integral = np.concatenate(
      [[0.0], np.cumsum((integrand[1:] + integrand[:-1]) / 2) * dt])
  var = m ** 2 * integral
  if isinstance(any_sde, sde_lib.VESDE):
    # VE variance grows from sigma(0)^2, not 0: add the offset.
    var = var + float(any_sde.sigma_t(ts[0])) ** 2
  np.testing.assert_allclose(
      np.sqrt(var[1:]), np.asarray(std_true)[1:], rtol=2e-2, atol=1e-3)


def test_subvp_diffusion_paper_formula():
  s = SDES["subvp"]
  t = jnp.linspace(0.01, 1.0, 16)
  x = jnp.zeros((16, 1, 1, 1))
  _, g = s.sde(x, t)
  beta_t = 0.1 + np.asarray(t) * (20.0 - 0.1)
  discount = 1 - np.exp(-2 * 0.1 * np.asarray(t) - (20.0 - 0.1) * np.asarray(t) ** 2)
  np.testing.assert_allclose(np.asarray(g), np.sqrt(beta_t * discount),
                             rtol=1e-3, atol=1e-5)


def test_reverse_sde_zero_score_keeps_drift(any_sde):
  x = _batch()
  t = jnp.full((x.shape[0],), 0.5)
  zero_score = lambda xx, tt: jnp.zeros_like(xx)
  rsde = any_sde.reverse(zero_score)
  drift_f, diff_f = any_sde.sde(x, t)
  drift_r, diff_r = rsde.sde(x, t)
  np.testing.assert_allclose(np.asarray(drift_r), np.asarray(drift_f), rtol=1e-6)
  np.testing.assert_allclose(np.asarray(diff_r), np.asarray(diff_f), rtol=1e-6)


def test_probability_flow_halves_score_and_zeroes_diffusion():
  s = SDES["vp"]
  x = _batch()
  t = jnp.full((x.shape[0],), 0.5)
  score = lambda xx, tt: jnp.ones_like(xx)
  ode = s.reverse(score, probability_flow=True)
  full = s.reverse(score, probability_flow=False)
  drift_f, _ = s.sde(x, t)
  drift_ode, diff_ode = ode.sde(x, t)
  drift_full, _ = full.sde(x, t)
  np.testing.assert_allclose(np.asarray(diff_ode), 0.0)
  np.testing.assert_allclose(
      np.asarray(drift_ode - drift_f), np.asarray(drift_full - drift_f) / 2, rtol=1e-5)


def test_ve_discretize_smld_ladder():
  s = SDES["ve"]
  x = _batch()
  # timestep 0 → adjacent sigma is 0
  t0 = jnp.zeros((x.shape[0],))
  f, g = s.discretize(x, t0)
  np.testing.assert_allclose(np.asarray(f), 0.0)
  np.testing.assert_allclose(np.asarray(g), float(s.discrete_sigmas[0]), rtol=1e-5)
  # generic timestep: G = sqrt(sigma_i^2 - sigma_{i-1}^2)
  i = 37
  t = jnp.full((x.shape[0],), i / (s.N - 1))
  _, g = s.discretize(x, t)
  sig = np.asarray(s.discrete_sigmas)
  np.testing.assert_allclose(np.asarray(g), np.sqrt(sig[i] ** 2 - sig[i - 1] ** 2), rtol=1e-4)


def test_vp_discretize_ddpm():
  s = SDES["vp"]
  x = _batch()
  i = 12
  t = jnp.full((x.shape[0],), i / (s.N - 1))
  f, g = s.discretize(x, t)
  betas = np.asarray(s.discrete_betas)
  np.testing.assert_allclose(np.asarray(g), np.sqrt(betas[i]), rtol=1e-5)
  np.testing.assert_allclose(
      np.asarray(f), (np.sqrt(1 - betas[i]) - 1) * np.asarray(x), rtol=1e-4)


def test_sdes_are_jit_static():
  """SDE objects close over jitted functions without retracing trouble."""
  s = SDES["vp"]

  @jax.jit
  def step(x, t):
    drift, diffusion = s.sde(x, t)
    return drift + sde_lib.batch_mul(diffusion, jnp.ones_like(x))

  x = _batch()
  t = jnp.full((x.shape[0],), 0.3)
  out = step(x, t)
  assert out.shape == x.shape


def test_build_sde_from_config():
  import ml_collections
  cfg = ml_collections.ConfigDict()
  cfg.training = ml_collections.ConfigDict({"sde": "vesde"})
  cfg.model = ml_collections.ConfigDict(
      {"sigma_min": 0.01, "sigma_max": 50.0, "num_scales": 1000,
       "beta_min": 0.1, "beta_max": 20.0})
  s = sde_lib.build_sde(cfg)
  assert isinstance(s, sde_lib.VESDE) and s.N == 1000


def test_vp_subvp_discrete_betas_guard():
  """Discrete DDPM buffers with N <= beta_max would have beta_i >= 1 →
  negative alphas → NaN from every discrete rule (a latent reference
  footgun; it only ever runs N=1000). The buffers must raise loudly at
  trace time instead; purely continuous use at tiny N stays legal."""
  import pytest
  from score_sde_pytorch_tpu import sde as sde_lib

  for cls in (sde_lib.VPSDE, sde_lib.SubVPSDE):
    tiny = cls(N=8)
    with pytest.raises(ValueError, match="num_scales > beta_max"):
      _ = tiny.discrete_betas
    # continuous methods unaffected
    x = jnp.ones((2, 4, 4, 1))
    t = jnp.full((2,), 0.5)
    drift, diffusion = tiny.sde(x, t)
    assert np.isfinite(np.asarray(drift)).all()
    # valid N works
    ok = cls(N=32)
    assert np.isfinite(np.asarray(ok.alphas)).all()
    assert (np.asarray(ok.alphas) > 0).all()
