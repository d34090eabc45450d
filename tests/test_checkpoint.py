"""Two-tier checkpoint tests (preemption resume semantics, SURVEY.md §5)."""
import jax
import jax.numpy as jnp
import numpy as np

from score_sde_pytorch_tpu import checkpoint as ckpt_lib
from score_sde_pytorch_tpu import losses
from tests.test_losses import _setup


def test_cold_start_returns_template(tmp_path):
  mgr = ckpt_lib.CheckpointManager(str(tmp_path))
  _, _, _, state = _setup()
  restored = mgr.restore_meta(state)
  assert restored is state  # graceful-if-missing (reference utils.py:7-12)


def test_meta_roundtrip(tmp_path):
  cfg, sde, model_def, state = _setup()
  optimizer = losses.get_optimizer(cfg)
  step_fn = jax.jit(losses.get_step_fn(sde, model_def, train=True,
                                       optimizer=optimizer))
  batch = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  state, _ = step_fn(state, batch)
  state, _ = step_fn(state, batch)

  mgr = ckpt_lib.CheckpointManager(str(tmp_path))
  mgr.save_meta(state)

  _, fresh = losses.init_train_state(cfg, jax.random.PRNGKey(99))
  restored = mgr.restore_meta(fresh)
  assert int(restored.step) == 2
  for a, b in zip(jax.tree.leaves(state.params),
                  jax.tree.leaves(restored.params)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  # EMA and optimizer state survive too
  assert int(restored.ema.num_updates) == 2
  for a, b in zip(jax.tree.leaves(state.opt_state),
                  jax.tree.leaves(restored.opt_state)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_numbered_tier_and_latest(tmp_path):
  cfg, sde, model_def, state = _setup()
  mgr = ckpt_lib.CheckpointManager(str(tmp_path))
  assert mgr.latest_numbered() is None
  mgr.save_numbered(state, 1)
  mgr.save_numbered(state, 3)
  assert mgr.has_numbered(1) and mgr.has_numbered(3)
  assert not mgr.has_numbered(2)
  assert mgr.latest_numbered() == 3
  _, fresh = losses.init_train_state(cfg, jax.random.PRNGKey(99))
  restored = mgr.restore_numbered(fresh, 3)
  assert int(restored.step) == int(state.step)


def test_meta_overwrite_is_rolling(tmp_path):
  cfg, sde, model_def, state = _setup()
  mgr = ckpt_lib.CheckpointManager(str(tmp_path))
  mgr.save_meta(state)
  state2 = state.replace(step=state.step + 10)
  mgr.save_meta(state2)
  _, fresh = losses.init_train_state(cfg, jax.random.PRNGKey(99))
  restored = mgr.restore_meta(fresh)
  assert int(restored.step) == 10
