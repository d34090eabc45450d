"""Golden-numerics tests: predictor/corrector update steps vs the reference.

The reference's sampling.py (predictor/corrector classes, sampling.py:126-330)
is importable on CPU torch (its only deps are sde_lib, models/utils, scipy).
We drive single update steps of every predictor x SDE and corrector x SDE cell
with an analytic score function and *identical injected noise* on both sides
(torch.randn_like and jax.random.normal are monkeypatched to the same constant
tensor), so the comparison is exact formula parity, not statistics.

Complements tests/test_golden_sde.py (SDE core) and tests/test_interop.py
(model forward parity): together these pin the full sampling numerics chain.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
try:
  import sde_lib as ref_sde  # noqa: E402  (reference, read-only oracle)
  import sampling as ref_sampling  # noqa: E402
  HAVE_REF = True
except Exception:  # pragma: no cover
  HAVE_REF = False

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from score_sde_pytorch_tpu import sampling as our_sampling  # noqa: E402
from score_sde_pytorch_tpu import sde as our_sde  # noqa: E402
from score_sde_pytorch_tpu.sde import batch_mul  # noqa: E402

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference sampling unavailable")

N = 100  # discretization steps — keep dt large enough to be informative


def _pairs():
  return {
      "vp": (our_sde.VPSDE(beta_min=0.1, beta_max=20.0, N=N),
             ref_sde.VPSDE(beta_min=0.1, beta_max=20.0, N=N)),
      "subvp": (our_sde.SubVPSDE(beta_min=0.1, beta_max=20.0, N=N),
                ref_sde.subVPSDE(beta_min=0.1, beta_max=20.0, N=N)),
      "ve": (our_sde.VESDE(sigma_min=0.01, sigma_max=50.0, N=N),
             ref_sde.VESDE(sigma_min=0.01, sigma_max=50.0, N=N)),
  }


def _our_score(x, t):
  return batch_mul(-1.0 / (1.0 + t), x)


def _ref_score(x, t):
  return -x / (1.0 + t)[:, None, None, None]


def _data(b=4):
  rng = np.random.default_rng(7)
  x = rng.normal(size=(b, 8, 8, 3)).astype(np.float32)
  # grid timesteps exactly representable by the discrete index maps,
  # including the i=0 endpoint special-cased by ancestral sampling
  t = np.array([0.0, 17.0 / (N - 1), 55.0 / (N - 1), 1.0], np.float32)
  noise = rng.normal(size=(b, 8, 8, 3)).astype(np.float32)
  return x, t, noise


def _nchw(x):
  return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(x):
  return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


def _run_pair(monkeypatch, sde_name, build_ref_update, build_our_update,
              atol=1e-4):  # fp32 op-ordering roundoff at VE's sigma~50 scale
  ours, ref = _pairs()[sde_name]
  x, t, noise = _data()

  monkeypatch.setattr(torch, "randn_like",
                      lambda y, **kw: _nchw(noise).to(y.dtype))
  rx, rmean = build_ref_update(ref)(_nchw(x), torch.from_numpy(t))

  monkeypatch.setattr(jax.random, "normal",
                      lambda key, shape, dtype=jnp.float32: jnp.asarray(noise))
  ox, omean = build_our_update(ours)(jax.random.PRNGKey(0), jnp.asarray(x),
                                     jnp.asarray(t))

  np.testing.assert_allclose(np.asarray(omean), _nhwc(rmean),
                             atol=atol, rtol=1e-5)
  np.testing.assert_allclose(np.asarray(ox), _nhwc(rx), atol=atol, rtol=1e-5)


# euler_maruyama x probability_flow is excluded: the REFERENCE crashes there
# (sampling.py:186 indexes `diffusion[:, None, None, None]` after RSDE.sde
# set diffusion to the python float 0. for prob flow, sde_lib.py:98 — latent
# upstream bug; prob-flow sampling ships via the ODE sampler instead). Ours
# returns a zeros array so the EM prob-flow path works; no oracle to compare.
@pytest.mark.parametrize("sde_name", ["vp", "subvp", "ve"])
@pytest.mark.parametrize("name, probability_flow",
                         [("euler_maruyama", False),
                          ("reverse_diffusion", False),
                          ("reverse_diffusion", True),
                          ("none", False), ("none", True)])
def test_predictor_step_matches_reference(monkeypatch, sde_name, name,
                                          probability_flow):
  _run_pair(
      monkeypatch, sde_name,
      lambda ref: ref_sampling.get_predictor(name)(
          ref, _ref_score, probability_flow).update_fn,
      lambda ours: our_sampling.get_predictor(name)(
          ours, _our_score, probability_flow))


@pytest.mark.parametrize("sde_name", ["vp", "ve"])
def test_ancestral_predictor_matches_reference(monkeypatch, sde_name):
  _run_pair(
      monkeypatch, sde_name,
      lambda ref: ref_sampling.get_predictor("ancestral_sampling")(
          ref, _ref_score, False).update_fn,
      lambda ours: our_sampling.get_predictor("ancestral_sampling")(
          ours, _our_score, False))


# subvp is excluded from the REFERENCE comparison: the reference corrector
# path crashes there (sampling.py:261-265,300-306 reads sde.alphas, which
# subVPSDE never defines, despite those isinstance checks explicitly
# accepting subVPSDE — no shipped subVP config pairs with a corrector, so
# the bug is latent upstream). Ours defines SubVPSDE.discrete_betas/alphas
# (sde.py — same linear beta schedule as VP), so subVP correctors RUN; they
# are pinned below against closed-form oracles instead
# (test_subvp_langevin_equals_vp / test_subvp_ald_closed_form).
@pytest.mark.parametrize("sde_name", ["vp", "ve"])
@pytest.mark.parametrize("name", ["langevin", "ald", "none"])
@pytest.mark.parametrize("n_steps", [1, 3])
def test_corrector_step_matches_reference(monkeypatch, sde_name, name,
                                          n_steps):
  # constant per-step noise on both sides makes the n_steps>1 chain exact
  # despite langevin's noise-norm-dependent step size (sampling.py:253-282)
  _run_pair(
      monkeypatch, sde_name,
      lambda ref: ref_sampling.get_corrector(name)(
          ref, _ref_score, snr=0.16, n_steps=n_steps).update_fn,
      lambda ours: our_sampling.get_corrector(name)(
          ours, _our_score, snr=0.16, n_steps=n_steps))


def test_subvp_alphas_match_vp():
  """SubVPSDE shares VP's linear beta schedule, so its discrete alphas must
  equal VPSDE's exactly (the reference's intent at sampling.py:261-265)."""
  vp, subvp = our_sde.VPSDE(N=N), our_sde.SubVPSDE(N=N)
  np.testing.assert_array_equal(np.asarray(subvp.discrete_betas),
                                np.asarray(vp.discrete_betas))
  np.testing.assert_array_equal(np.asarray(subvp.alphas),
                                np.asarray(vp.alphas))


@pytest.mark.parametrize("n_steps", [1, 3])
def test_subvp_langevin_equals_vp(monkeypatch, n_steps):
  """VP-equivalence oracle: the Langevin corrector update reads ONLY
  sde.alphas + score (reference sampling.py:253-282) and subVP's alphas
  equal VP's, so with identical injected noise the two updates are
  bitwise-identical."""
  x, t, noise = _data()
  monkeypatch.setattr(jax.random, "normal",
                      lambda key, shape, dtype=jnp.float32: jnp.asarray(noise))
  outs = {}
  for tag, sde in (("vp", our_sde.VPSDE(N=N)),
                   ("subvp", our_sde.SubVPSDE(N=N))):
    fn = our_sampling.get_corrector("langevin")(sde, _our_score, snr=0.16,
                                                n_steps=n_steps)
    outs[tag] = fn(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))
  np.testing.assert_array_equal(np.asarray(outs["vp"][0]),
                                np.asarray(outs["subvp"][0]))
  np.testing.assert_array_equal(np.asarray(outs["vp"][1]),
                                np.asarray(outs["subvp"][1]))


def test_subvp_ald_closed_form(monkeypatch):
  """Closed-form oracle for ALD x subVP: one step with fixed noise must be
  x_mean = x + eps*score, x' = x_mean + sqrt(2 eps) z with
  eps = (snr*std)^2 * 2 * alpha, std the subVP marginal std
  1 - exp(2*log_mean_coeff) (reference sampling.py:285-319 formula applied
  with the subVP kernel)."""
  snr = 0.16
  x, t, noise = _data()
  subvp = our_sde.SubVPSDE(N=N)
  monkeypatch.setattr(jax.random, "normal",
                      lambda key, shape, dtype=jnp.float32: jnp.asarray(noise))
  fn = our_sampling.get_corrector("ald")(subvp, _our_score, snr=snr,
                                         n_steps=1)
  ox, omean = fn(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))

  timestep = (t * (N - 1)).astype(np.int32)
  alpha = 1.0 - np.linspace(0.1 / N, 20.0 / N, N)[timestep]
  log_mean = -0.25 * t ** 2 * (20.0 - 0.1) - 0.5 * t * 0.1
  std = 1.0 - np.exp(2.0 * log_mean)
  eps = (snr * std) ** 2 * 2 * alpha
  score = -x / (1.0 + t)[:, None, None, None]
  want_mean = x + eps[:, None, None, None] * score
  want_x = want_mean + np.sqrt(2 * eps)[:, None, None, None] * noise
  np.testing.assert_allclose(np.asarray(omean), want_mean, atol=1e-5,
                             rtol=1e-5)
  np.testing.assert_allclose(np.asarray(ox), want_x, atol=1e-5, rtol=1e-5)
