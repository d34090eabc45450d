"""Flash (blockwise) attention kernel: exactness vs the dense path
(VERDICT r1 item #9; reference materializes O((HW)²) logits,
models/layerspp.py:82-86, capping attention at 16² grids).

On CPU the Pallas kernel runs in interpret mode — same program, same math.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_sde_pytorch_tpu.ops import attention


def _qkv(b, n, c, dtype=jnp.float32, seed=0):
  ks = jax.random.split(jax.random.PRNGKey(seed), 3)
  mk = lambda k: (jax.random.normal(k, (b, n, c)) * 2.0).astype(dtype)
  return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.mark.parametrize("n,c", [(1024, 128), (2048, 128), (1024, 256)])
def test_flash_matches_dense(n, c):
  q, k, v = _qkv(2, n, c)
  dense = attention.dense_attention(q, k, v)
  flash = attention.flash_attention(q, k, v, interpret=True)
  np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                             atol=2e-5, rtol=2e-5)


def test_flash_bf16_at_least_as_accurate_as_dense():
  """bf16 inputs: the kernel accumulates in fp32, so its error vs the fp32
  oracle must be no worse than the dense bf16 path's."""
  q, k, v = _qkv(1, 1024, 128)
  exact = np.asarray(attention.dense_attention(q, k, v))
  qb, kb, vb = (z.astype(jnp.bfloat16) for z in (q, k, v))
  flash = np.asarray(attention.flash_attention(qb, kb, vb, interpret=True),
                     np.float32)
  dense = np.asarray(attention.dense_attention(qb, kb, vb), np.float32)
  err_flash = np.abs(flash - exact).max()
  err_dense = np.abs(dense - exact).max()
  assert err_flash <= err_dense * 1.5 + 1e-3, (err_flash, err_dense)
  assert err_flash < 0.1


def test_flash_numerical_stability_large_logits():
  """Online softmax must survive logits far beyond exp range."""
  q, k, v = _qkv(1, 1024, 128)
  q = q * 30.0  # logits ~ O(1000) pre-scale
  dense = attention.dense_attention(q, k, v)
  flash = attention.flash_attention(q, k, v, interpret=True)
  assert np.isfinite(np.asarray(flash)).all()
  np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                             atol=1e-4, rtol=1e-4)


def test_flash_gradients_match_dense():
  """Custom VJP (chunked backward) vs autodiff through the dense path."""
  q, k, v = _qkv(1, 1024, 128)

  def loss_flash(q, k, v):
    return jnp.sum(attention._flash(q, k, v, True) ** 2)

  def loss_dense(q, k, v):
    return jnp.sum(attention.dense_attention(q, k, v) ** 2)

  gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
  gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
  for a, b in zip(gf, gd):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-4, rtol=5e-4)


def test_dispatch_thresholds():
  q16 = jnp.zeros((1, 256, 128))   # 16² grid → dense
  q32 = jnp.zeros((1, 1024, 128))  # 32² grid → flash
  assert not attention.flash_eligible(q16)
  assert attention.flash_eligible(q32)
  assert not attention.flash_eligible(jnp.zeros((1, 1024, 96)))  # lanes
  assert not attention.flash_eligible(jnp.zeros((1, 1100, 128)))  # tiling


def test_attn_block_uses_flash_on_large_grids(monkeypatch):
  """AttnBlockpp routes ≥32² grids through attention_auto → flash."""
  from score_sde_pytorch_tpu.models import layerspp
  from score_sde_pytorch_tpu import ops

  calls = {}
  real = attention.flash_attention

  def spy(q, k, v, **kw):
    calls["n"] = q.shape[1]
    kw["interpret"] = True  # CPU test host
    return real(q, k, v, **kw)

  monkeypatch.setattr(attention, "flash_attention", spy)
  blk = layerspp.AttnBlockpp(skip_rescale=True)
  x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 128))
  variables = blk.init(jax.random.PRNGKey(1), x)
  out = blk.apply(variables, x)
  assert out.shape == x.shape
  assert calls.get("n") == 1024
  # and the result matches a dense-only evaluation
  monkeypatch.setattr(attention, "flash_eligible", lambda q: False)
  out_dense = blk.apply(variables, x)
  np.testing.assert_allclose(np.asarray(out), np.asarray(out_dense),
                             atol=2e-5, rtol=2e-5)
