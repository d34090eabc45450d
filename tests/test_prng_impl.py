"""Tests for the configurable PRNG implementation (training.prng_impl).

On TPU the rbg (hardware RngBitGenerator) impl was measured 22% faster per
train step than software threefry (tools/train_ablation2.py); the knob must
be deterministic, checkpoint-transparent (state.rng stays threefry), and
statistically sane on every backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import score_sde_pytorch_tpu.models  # noqa: F401
from score_sde_pytorch_tpu import losses
from tests.test_losses import _setup


def test_as_prng_impl_identity_for_threefry():
  k = jax.random.PRNGKey(0)
  assert losses.as_prng_impl(k, None) is k
  assert losses.as_prng_impl(k, "threefry2x32") is k


def test_as_prng_impl_deterministic_and_key_dependent():
  k1, k2 = jax.random.split(jax.random.PRNGKey(0))
  a = jax.random.normal(losses.as_prng_impl(k1, "rbg"), (16,))
  b = jax.random.normal(losses.as_prng_impl(k1, "rbg"), (16,))
  c = jax.random.normal(losses.as_prng_impl(k2, "rbg"), (16,))
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  assert not np.allclose(np.asarray(a), np.asarray(c))


def test_rbg_normals_statistics():
  x = jax.random.normal(losses.as_prng_impl(jax.random.PRNGKey(3), "rbg"),
                        (200_000,))
  x = np.asarray(x)
  assert abs(x.mean()) < 0.02
  assert abs(x.std() - 1.0) < 0.02


@pytest.mark.parametrize("impl", [None, "rbg"])
def test_train_step_runs_with_impl(impl):
  cfg, sde, model_def, state = _setup()
  optimizer = losses.get_optimizer(cfg)
  step = jax.jit(losses.get_step_fn(
      sde, model_def, train=True, optimizer=optimizer,
      continuous=cfg.training.continuous, prng_impl=impl))
  batch = jnp.zeros((4, cfg.data.image_size, cfg.data.image_size, 3))
  new_state, loss = step(state, batch)
  assert int(new_state.step) == 1
  assert np.isfinite(float(loss))
  # carried rng stays a plain threefry key either way (checkpoint format)
  assert new_state.rng.dtype == state.rng.dtype
  assert new_state.rng.shape == state.rng.shape


@pytest.mark.slow  # 4 independent n-step jit compiles
@pytest.mark.parametrize("impl", [None, "rbg"])
def test_same_seed_runs_bitwise_identical(impl):
  """Reproducibility contract (VERDICT r3 #6 / ADVICE r2): two runs from the
  same seed on the same backend produce bitwise-identical losses AND params,
  for both the threefry default and the rbg fast path. (rbg's caveat — which
  this cannot test — is stability across XLA versions/platforms, not within
  one; documented in README 'Reproducibility'.)"""
  results = []
  for _ in range(2):
    cfg, sde, model_def, state = _setup()
    optimizer = losses.get_optimizer(cfg)
    n_step = jax.jit(losses.get_n_step_fn(
        sde, model_def, train=True, optimizer=optimizer, n_steps=4,
        continuous=cfg.training.continuous, prng_impl=impl))
    rng = np.random.default_rng(0)
    batches = jnp.asarray(rng.normal(
        size=(4, 4, cfg.data.image_size, cfg.data.image_size, 3)
    ).astype(np.float32))
    new_state, losses_out = n_step(state, batches)
    leaf = jax.tree.leaves(new_state.params)[0]
    results.append((np.asarray(losses_out), np.asarray(leaf)))
  np.testing.assert_array_equal(results[0][0], results[1][0])
  np.testing.assert_array_equal(results[0][1], results[1][1])


def test_scanned_steps_with_rbg():
  cfg, sde, model_def, state = _setup()
  optimizer = losses.get_optimizer(cfg)
  n_step = jax.jit(losses.get_n_step_fn(
      sde, model_def, train=True, optimizer=optimizer, n_steps=3,
      continuous=cfg.training.continuous, prng_impl="rbg"))
  batches = jnp.zeros((3, 4, cfg.data.image_size, cfg.data.image_size, 3))
  new_state, losses_out = n_step(state, batches)
  assert int(new_state.step) == 3
  assert np.isfinite(np.asarray(losses_out)).all()
