"""Model zoo tests: shapes, registry, score-fn conventions, EMA.

Uses tiny configs (nf=8..16, 16px) so CPU CI stays fast; architecture code
paths (resblock types, FIR, progressive modes, embeddings) are identical to
full-size (SURVEY.md §4(e)).
"""
import ml_collections
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_sde_pytorch_tpu import sde as sde_lib
from score_sde_pytorch_tpu.models import ema as ema_lib
from score_sde_pytorch_tpu.models import utils as mutils
import score_sde_pytorch_tpu.models  # noqa: F401 — registers models


def tiny_config(name="ncsnpp", image_size=16, **model_overrides):
  c = ml_collections.ConfigDict()
  c.training = ml_collections.ConfigDict(
      {"sde": "vesde", "continuous": True})
  c.data = ml_collections.ConfigDict(
      {"image_size": image_size, "num_channels": 3, "centered": False})
  c.model = ml_collections.ConfigDict({
      "name": name,
      "scale_by_sigma": True,
      "ema_rate": 0.999,
      "normalization": "GroupNorm",
      "nonlinearity": "swish",
      "nf": 8,
      "ch_mult": (1, 2),
      "num_res_blocks": 1,
      "attn_resolutions": (8,),
      "resamp_with_conv": True,
      "conditional": True,
      "fir": False,
      "fir_kernel": [1, 3, 3, 1],
      "skip_rescale": True,
      "resblock_type": "biggan",
      "progressive": "none",
      "progressive_input": "none",
      "progressive_combine": "sum",
      "attention_type": "ddpm",
      "init_scale": 0.0,
      "embedding_type": "fourier",
      "fourier_scale": 16,
      "conv_size": 3,
      "sigma_min": 0.01,
      "sigma_max": 50.0,
      "num_scales": 100,
      "beta_min": 0.1,
      "beta_max": 20.0,
      "dropout": 0.1,
  })
  for k, v in model_overrides.items():
    setattr(c.model, k, v)
  return c


def _forward(config, t_val=0.5):
  rng = jax.random.PRNGKey(0)
  model_def, variables = mutils.create_model(config, rng)
  x = jax.random.normal(jax.random.PRNGKey(1),
                        (2, config.data.image_size, config.data.image_size,
                         config.data.num_channels))
  t = jnp.full((2,), t_val)
  out = model_def.apply(variables, x, t, train=False)
  return out, variables


def test_ncsnpp_basic_forward():
  out, _ = _forward(tiny_config())
  assert out.shape == (2, 16, 16, 3)
  assert np.all(np.isfinite(np.asarray(out)))


def test_ncsnpp_fir_biggan():
  out, _ = _forward(tiny_config(fir=True))
  assert out.shape == (2, 16, 16, 3)


def test_ncsnpp_ddpm_resblocks_positional():
  cfg = tiny_config(resblock_type="ddpm", embedding_type="positional",
                    scale_by_sigma=False)
  out, _ = _forward(cfg, t_val=10.0)
  assert out.shape == (2, 16, 16, 3)


@pytest.mark.parametrize("progressive,progressive_input,combine", [
    ("output_skip", "input_skip", "sum"),
    ("output_skip", "input_skip", "cat"),
    ("residual", "residual", "sum"),
])
def test_ncsnpp_progressive_paths(progressive, progressive_input, combine):
  cfg = tiny_config(progressive=progressive,
                    progressive_input=progressive_input,
                    progressive_combine=combine, fir=True)
  out, _ = _forward(cfg)
  assert out.shape == (2, 16, 16, 3)


def test_ddpm_forward():
  cfg = tiny_config(name="ddpm", embedding_type="positional",
                    scale_by_sigma=False)
  rng = jax.random.PRNGKey(0)
  model_def, variables = mutils.create_model(cfg, rng)
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  labels = jnp.array([0.0, 50.0])
  out = model_def.apply(variables, x, labels, train=False)
  assert out.shape == (2, 16, 16, 3)


def test_ncsnv2_forward():
  cfg = tiny_config(name="ncsnv2_64", normalization="InstanceNorm++",
                    nonlinearity="elu", scale_by_sigma=False)
  rng = jax.random.PRNGKey(0)
  model_def, variables = mutils.create_model(cfg, rng)
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  y = jnp.array([0.0, 3.0])
  out = model_def.apply(variables, x, y, train=False)
  assert out.shape == (2, 16, 16, 3)


def test_ncsn_conditional_forward():
  cfg = tiny_config(name="ncsn", normalization="InstanceNorm++",
                    nonlinearity="elu", scale_by_sigma=False)
  rng = jax.random.PRNGKey(0)
  model_def, variables = mutils.create_model(cfg, rng)
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  y = jnp.array([0.0, 3.0])
  out = model_def.apply(variables, x, y, train=False)
  assert out.shape == (2, 16, 16, 3)


def test_registry_rejects_duplicates():
  with pytest.raises(ValueError):
    @mutils.register_model(name="ncsnpp")
    class Foo:  # noqa
      pass


def test_score_fn_ve_continuous_labels_are_sigmas():
  """VE continuous: model is called with sigma(t); scale_by_sigma divides
  output by sigma — so score magnitude ~ 1/sigma for large sigma."""
  cfg = tiny_config()
  rng = jax.random.PRNGKey(0)
  model_def, variables = mutils.create_model(cfg, rng)
  s = sde_lib.VESDE(sigma_min=0.01, sigma_max=50.0, N=100)
  score_fn = mutils.get_score_fn(s, model_def, variables["params"],
                                 train=False, continuous=True)
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  t = jnp.full((2,), 1.0)  # sigma = sigma_max
  out = score_fn(x, t)
  assert out.shape == x.shape
  assert np.all(np.isfinite(np.asarray(out)))


def test_score_fn_vp_scaling():
  """VP: score = -model_output / std(t)."""
  cfg = tiny_config(scale_by_sigma=False)
  rng = jax.random.PRNGKey(0)
  model_def, variables = mutils.create_model(cfg, rng)
  s = sde_lib.VPSDE(N=100)
  score_fn = mutils.get_score_fn(s, model_def, variables["params"],
                                 train=False, continuous=True)
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  t = jnp.full((2,), 0.5)
  score = score_fn(x, t)
  raw = model_def.apply(variables, x, t * 999, train=False)
  _, std = s.marginal_prob(jnp.zeros_like(x), t)
  np.testing.assert_allclose(
      np.asarray(score), np.asarray(-raw / std[0]), rtol=1e-5)


def test_model_fn_train_mode_uses_dropout_rng():
  cfg = tiny_config(dropout=0.5)
  rng = jax.random.PRNGKey(0)
  model_def, variables = mutils.create_model(cfg, rng)
  model_fn = mutils.get_model_fn(model_def, variables["params"], train=True)
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  labels = jnp.full((2,), 5.0)
  o1 = model_fn(x, labels, rng=jax.random.PRNGKey(10))
  o2 = model_fn(x, labels, rng=jax.random.PRNGKey(11))
  assert not np.array_equal(np.asarray(o1), np.asarray(o2))


def test_ema_warmup_and_convergence():
  params = {"w": jnp.zeros((3,))}
  state = ema_lib.init(params, decay=0.999)
  new = {"w": jnp.ones((3,))}
  # First update: decay = min(0.999, 2/11) → shadow moves a lot.
  state = ema_lib.update(state, new)
  first = float(state.params["w"][0])
  assert 0.5 < first < 1.0
  for _ in range(200):
    state = ema_lib.update(state, new)
  np.testing.assert_allclose(np.asarray(state.params["w"]), 1.0, atol=1e-2)


def test_get_sigmas_descending():
  cfg = tiny_config()
  sig = mutils.get_sigmas(cfg)
  assert sig[0] == pytest.approx(50.0)
  assert sig[-1] == pytest.approx(0.01)
  assert np.all(np.diff(sig) < 0)


def test_fourier_projection_param_not_trained():
  """W of GaussianFourierProjection must receive zero gradient."""
  cfg = tiny_config()
  rng = jax.random.PRNGKey(0)
  model_def, variables = mutils.create_model(cfg, rng)
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  t = jnp.full((2,), 0.5)

  def loss(params):
    return jnp.sum(model_def.apply({"params": params}, x, t, train=False) ** 2)

  g = jax.grad(loss)(variables["params"])
  w_grad = g["FourierProj"]["W"]
  np.testing.assert_allclose(np.asarray(w_grad), 0.0)


def test_ncsnpp_bfloat16_compute():
  """bf16 compute path: fp32 params, finite output, close to fp32 result."""
  cfg32 = tiny_config()
  cfg16 = tiny_config()
  cfg16.model.dtype = "bfloat16"
  rng = jax.random.PRNGKey(0)
  model32, vars32 = mutils.create_model(cfg32, rng)
  model16, vars16 = mutils.create_model(cfg16, rng)
  # identical params (same init rng, dtype only affects compute)
  for a, b in zip(jax.tree.leaves(vars32["params"]),
                  jax.tree.leaves(vars16["params"])):
    assert a.dtype == jnp.float32 and b.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  t = jnp.full((2,), 0.5)
  o32 = model32.apply(vars32, x, t, train=False)
  o16 = model16.apply(vars16, x, t, train=False)
  assert o16.dtype == jnp.float32  # output cast back
  assert np.isfinite(np.asarray(o16)).all()
  denom = np.abs(np.asarray(o32)).mean() + 1e-8
  assert np.abs(np.asarray(o16) - np.asarray(o32)).mean() / denom < 0.2


def test_ncsnpp_remat_matches_no_remat():
  """remat recomputes instead of storing — results must be identical."""
  cfg = tiny_config()
  cfg_r = tiny_config()
  cfg_r.model.remat = True
  rng = jax.random.PRNGKey(0)
  m0, v0 = mutils.create_model(cfg, rng)
  m1, v1 = mutils.create_model(cfg_r, rng)
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  t = jnp.full((2,), 0.5)
  o0 = m0.apply(v0, x, t, train=False)
  o1 = m1.apply(v1, x, t, train=False)
  np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), rtol=1e-5,
                             atol=1e-6)

  def loss0(p):
    return jnp.sum(m0.apply({"params": p}, x, t, train=False) ** 2)

  def loss1(p):
    return jnp.sum(m1.apply({"params": p}, x, t, train=False) ** 2)

  g0 = jax.grad(loss0)(v0["params"])
  g1 = jax.grad(loss1)(v1["params"])
  for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-6)


def test_ncsnv2_128_and_256_variants():
  """Size-variant RefineNet stacks forward (instantiated directly)."""
  from score_sde_pytorch_tpu.models import ncsnv2 as v2
  cfg = tiny_config(name="ncsnv2_128", normalization="InstanceNorm++",
                    nonlinearity="elu", scale_by_sigma=False, image_size=64)
  rng = jax.random.PRNGKey(0)
  x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
  y = jnp.array([2.0])
  m128 = v2.NCSNv2_128(cfg)
  vars128 = m128.init(rng, x, y, train=False)
  out = m128.apply(vars128, x, y, train=False)
  assert out.shape == (1, 64, 64, 3)

  cfg256 = tiny_config(name="ncsnv2_256", normalization="InstanceNorm++",
                       nonlinearity="elu", scale_by_sigma=False,
                       image_size=64)
  m256 = v2.NCSNv2_256(cfg256)
  vars256 = m256.init(rng, x, y, train=False)
  out = m256.apply(vars256, x, y, train=False)
  assert out.shape == (1, 64, 64, 3)


def test_get_network_size_dispatch():
  from score_sde_pytorch_tpu.models import ncsnv2 as v2
  for size, cls in ((32, v2.NCSNv2), (128, v2.NCSNv2_128),
                    (256, v2.NCSNv2_256)):
    cfg = tiny_config(name="x", image_size=size)
    assert v2.get_network(cfg).func is cls


def test_conditional_batchnorm2d():
  """ConditionalBatchNorm2d (reference normalization.py:43-65): non-affine
  BN + per-class gamma/beta embedding; running stats in batch_stats."""
  from score_sde_pytorch_tpu.models.normalization import ConditionalBatchNorm2d

  m = ConditionalBatchNorm2d(num_features=4, num_classes=3)
  x = jax.random.normal(jax.random.PRNGKey(0), (6, 8, 8, 4)) * 3.0 + 1.0
  y = jnp.array([0, 1, 2, 0, 1, 2])
  variables = m.init(jax.random.PRNGKey(1), x, y, train=True)
  assert "batch_stats" in variables
  out, updates = m.apply(variables, x, y, train=True,
                         mutable=["batch_stats"])
  assert out.shape == x.shape
  # gamma uniform / beta zero init: normalized then per-class scaled
  emb = variables["params"]["embed"]
  assert emb.shape == (3, 8)
  np.testing.assert_allclose(emb[:, 4:], 0.0)
  assert (emb[:, :4] >= 0).all() and (emb[:, :4] <= 1).all()
  # per-class gamma actually multiplies the normalized activations
  h = m.apply(variables, x, y, train=True, mutable=["batch_stats"])[0]
  g = emb[np.asarray(y)][:, :4]
  np.testing.assert_allclose(
      np.asarray(h) / np.asarray(g)[:, None, None, :] * 2.0,
      np.asarray(h * 2.0) / np.asarray(g)[:, None, None, :], rtol=1e-5)
  # eval mode uses running stats without mutation
  variables2 = {"params": variables["params"],
                "batch_stats": updates["batch_stats"]}
  out_eval = m.apply(variables2, x, y, train=False)
  assert np.isfinite(np.asarray(out_eval)).all()
  # no-bias variant: single gamma embedding
  m2 = ConditionalBatchNorm2d(num_features=4, num_classes=3, bias=False)
  v2 = m2.init(jax.random.PRNGKey(2), x, y, train=True)
  assert v2["params"]["embed"].shape == (3, 4)


@pytest.mark.parametrize("name", ["ncsnv2_64", "ncsn"])
def test_refinenet_models_bf16_and_remat(name):
  """dtype/remat options on the RefineNet family (API parity with NCSN++)."""
  cfg = tiny_config(name=name, normalization="InstanceNorm++",
                    nonlinearity="elu", scale_by_sigma=False)
  cfg.model.dtype = "bfloat16"
  cfg.model.remat = True
  rng = jax.random.PRNGKey(0)
  model_def, variables = mutils.create_model(cfg, rng)
  # params stay fp32
  assert all(p.dtype == jnp.float32
             for p in jax.tree.leaves(variables["params"]))
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  y = jnp.array([0.0, 3.0])
  out = model_def.apply(variables, x, y, train=False)
  assert out.shape == (2, 16, 16, 3)
  assert out.dtype == jnp.float32  # output cast back up
  assert np.isfinite(np.asarray(out)).all()
  # bf16 result tracks the fp32 result
  cfg32 = tiny_config(name=name, normalization="InstanceNorm++",
                      nonlinearity="elu", scale_by_sigma=False)
  model32, _ = mutils.create_model(cfg32, rng)
  out32 = model32.apply(variables, x, y, train=False)
  assert np.allclose(np.asarray(out), np.asarray(out32), atol=0.2, rtol=0.2)
  # gradients flow through the remat blocks
  def loss(params):
    return jnp.sum(model_def.apply({"params": params}, x, y, train=False) ** 2)
  g = jax.grad(loss)(variables["params"])
  assert np.isfinite(float(jax.tree.reduce(
      lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))


def test_selective_remat_gradient_parity():
  """remat / selective remat (remat_min_res) / no remat: identical forward
  AND gradients — rematerialization must change memory, never math
  (models/ncsnpp.py block_call; VERDICT r2 #8)."""
  import jax

  grads = {}
  for tag, overrides in {
      "off": dict(remat=False),
      "all": dict(remat=True),
      "sel": dict(remat=True, remat_min_res=16),  # only the 16px level
  }.items():
    cfg = tiny_config(**overrides)
    cfg.model.dropout = 0.0
    model_def, variables = mutils.create_model(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 10.0)

    def loss(params):
      out = model_def.apply({"params": params}, x, t, train=True,
                            rngs={"dropout": jax.random.PRNGKey(2)})
      return jnp.sum(out ** 2)

    grads[tag] = jax.grad(loss)(variables["params"])

  for tag in ("all", "sel"):
    for a, b in zip(jax.tree.leaves(grads["off"]), jax.tree.leaves(grads[tag])):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 rtol=1e-5, atol=1e-6)
