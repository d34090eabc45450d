"""Golden-numerics tests: our SDE core vs the reference implementation.

The reference's sde_lib.py is pure torch/numpy with no CUDA or model
dependencies, so it runs as a CPU oracle (SURVEY.md §4(c)). We import it
read-only from /root/reference and compare drift/diffusion/marginals/
discretizations/prior log-densities on identical inputs.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
try:
  import sde_lib as ref_sde  # noqa: E402  (reference, read-only oracle)
  HAVE_REF = True
except Exception:  # pragma: no cover
  HAVE_REF = False

import jax.numpy as jnp  # noqa: E402

from score_sde_pytorch_tpu import sde as our_sde  # noqa: E402

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference sde_lib unavailable")

RNG = np.random.default_rng(0)


def _pairs():
  return [
      (our_sde.VPSDE(beta_min=0.1, beta_max=20.0, N=1000),
       ref_sde.VPSDE(beta_min=0.1, beta_max=20.0, N=1000)),
      (our_sde.SubVPSDE(beta_min=0.1, beta_max=20.0, N=1000),
       ref_sde.subVPSDE(beta_min=0.1, beta_max=20.0, N=1000)),
      (our_sde.VESDE(sigma_min=0.01, sigma_max=50.0, N=1000),
       ref_sde.VESDE(sigma_min=0.01, sigma_max=50.0, N=1000)),
  ]


def _data(b=4):
  x = RNG.normal(size=(b, 8, 8, 3)).astype(np.float32)
  t = RNG.uniform(1e-3, 1.0, size=(b,)).astype(np.float32)
  return x, t


def _torchify(x):
  # reference is NCHW
  return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _untorch(x):
  return np.transpose(x.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("idx", [0, 1, 2], ids=["vp", "subvp", "ve"])
def test_sde_drift_diffusion_match(idx):
  ours, ref = _pairs()[idx]
  x, t = _data()
  drift_o, diff_o = ours.sde(jnp.asarray(x), jnp.asarray(t))
  drift_r, diff_r = ref.sde(_torchify(x), torch.from_numpy(t))
  np.testing.assert_allclose(np.asarray(drift_o), _untorch(drift_r),
                             rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(np.asarray(diff_o), diff_r.numpy(), rtol=1e-5)


@pytest.mark.parametrize("idx", [0, 1, 2], ids=["vp", "subvp", "ve"])
def test_marginal_prob_match(idx):
  ours, ref = _pairs()[idx]
  x, t = _data()
  mean_o, std_o = ours.marginal_prob(jnp.asarray(x), jnp.asarray(t))
  mean_r, std_r = ref.marginal_prob(_torchify(x), torch.from_numpy(t))
  np.testing.assert_allclose(np.asarray(mean_o), _untorch(mean_r),
                             rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(np.asarray(std_o), std_r.numpy(), rtol=1e-5)


@pytest.mark.parametrize("idx", [0, 1, 2], ids=["vp", "subvp", "ve"])
def test_prior_logp_match(idx):
  ours, ref = _pairs()[idx]
  x, _ = _data()
  logp_o = ours.prior_logp(jnp.asarray(x))
  logp_r = ref.prior_logp(_torchify(x))
  np.testing.assert_allclose(np.asarray(logp_o), logp_r.numpy(), rtol=1e-4)


@pytest.mark.parametrize("idx", [0, 2], ids=["vp", "ve"])
def test_discretize_match(idx):
  ours, ref = _pairs()[idx]
  x, t = _data()
  f_o, g_o = ours.discretize(jnp.asarray(x), jnp.asarray(t))
  f_r, g_r = ref.discretize(_torchify(x), torch.from_numpy(t))
  np.testing.assert_allclose(np.asarray(f_o), _untorch(f_r), rtol=1e-4,
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(g_o), g_r.numpy(), rtol=1e-4)


@pytest.mark.parametrize("idx", [0, 1, 2], ids=["vp", "subvp", "ve"])
def test_reverse_sde_match(idx):
  """Reverse drift with a deterministic fake score matches the oracle."""
  ours, ref = _pairs()[idx]
  x, t = _data()

  def score_ours(xx, tt):
    return -xx * 0.5

  def score_ref(xx, tt):
    return -xx * 0.5

  r_o = ours.reverse(score_ours, probability_flow=False)
  drift_o, diff_o = r_o.sde(jnp.asarray(x), jnp.asarray(t))
  r_r = ref.reverse(score_ref, probability_flow=False)
  drift_r, diff_r = r_r.sde(_torchify(x), torch.from_numpy(t))
  np.testing.assert_allclose(np.asarray(drift_o), _untorch(drift_r),
                             rtol=1e-4, atol=1e-5)

  ode_o = ours.reverse(score_ours, probability_flow=True)
  d_o, z_o = ode_o.sde(jnp.asarray(x), jnp.asarray(t))
  ode_r = ref.reverse(score_ref, probability_flow=True)
  d_r, z_r = ode_r.sde(_torchify(x), torch.from_numpy(t))
  np.testing.assert_allclose(np.asarray(d_o), _untorch(d_r), rtol=1e-4,
                             atol=1e-5)
  # reference returns a scalar 0. for prob-flow diffusion (sde_lib.py:98)
  z_r_np = z_r.numpy() if hasattr(z_r, "numpy") else np.float32(z_r)
  np.testing.assert_allclose(np.asarray(z_o), z_r_np, atol=1e-7)


def test_vp_discrete_buffers_match():
  ours, ref = _pairs()[0]
  np.testing.assert_allclose(np.asarray(ours.discrete_betas),
                             ref.discrete_betas.numpy(), rtol=1e-6)
  np.testing.assert_allclose(np.asarray(ours.alphas_cumprod),
                             ref.alphas_cumprod.numpy(), rtol=1e-5)


def test_ve_discrete_sigmas_match():
  ours, ref = _pairs()[2]
  np.testing.assert_allclose(np.asarray(ours.discrete_sigmas),
                             ref.discrete_sigmas.numpy(), rtol=1e-5)
