"""Loss/step-function tests (SURVEY.md §2.5, §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_sde_pytorch_tpu import losses, sde as sde_lib
from score_sde_pytorch_tpu.models import utils as mutils
import score_sde_pytorch_tpu.models  # noqa: F401

from tests.test_models import tiny_config


def _setup(sde_name="vesde", continuous=True, **model_overrides):
  cfg = tiny_config(**model_overrides)
  cfg.training.sde = sde_name
  cfg.training.continuous = continuous
  cfg.optim = __import__("ml_collections").ConfigDict({
      "optimizer": "Adam", "lr": 1e-3, "beta1": 0.9, "eps": 1e-8,
      "warmup": 10, "grad_clip": 1.0, "weight_decay": 0})
  sde = sde_lib.build_sde(cfg)
  model_def, state = losses.init_train_state(cfg, jax.random.PRNGKey(0))
  return cfg, sde, model_def, state


def test_sde_loss_finite_and_positive():
  cfg, sde, model_def, state = _setup()
  loss_fn = losses.get_sde_loss_fn(sde, model_def, train=True,
                                   reduce_mean=False, continuous=True,
                                   likelihood_weighting=False)
  batch = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
  loss = loss_fn(state.params, batch, jax.random.PRNGKey(2))
  assert np.isfinite(float(loss)) and float(loss) > 0


def test_likelihood_weighting_changes_loss():
  cfg, sde, model_def, state = _setup(sde_name="vpsde", scale_by_sigma=False)
  batch = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
  l1 = losses.get_sde_loss_fn(sde, model_def, True, likelihood_weighting=False)(
      state.params, batch, jax.random.PRNGKey(2))
  l2 = losses.get_sde_loss_fn(sde, model_def, True, likelihood_weighting=True)(
      state.params, batch, jax.random.PRNGKey(2))
  assert float(l1) != float(l2)


def test_smld_loss_descending_sigma_convention():
  """Label 0 must map to the LARGEST sigma (torch.flip, losses.py:109)."""
  cfg, sde, model_def, state = _setup(sde_name="vesde", continuous=False,
                                      embedding_type="positional")
  flipped = jnp.flip(sde.discrete_sigmas)
  assert float(flipped[0]) == pytest.approx(50.0, rel=1e-4)
  loss_fn = losses.get_smld_loss_fn(sde, model_def, train=True)
  batch = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
  loss = loss_fn(state.params, batch, jax.random.PRNGKey(2))
  assert np.isfinite(float(loss))


def test_ddpm_loss_runs():
  cfg, sde, model_def, state = _setup(
      sde_name="vpsde", continuous=False, scale_by_sigma=False,
      embedding_type="positional")
  loss_fn = losses.get_ddpm_loss_fn(sde, model_def, train=True)
  batch = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
  loss = loss_fn(state.params, batch, jax.random.PRNGKey(2))
  assert np.isfinite(float(loss))


def test_train_step_updates_params_and_ema():
  cfg, sde, model_def, state = _setup()
  optimizer = losses.get_optimizer(cfg)
  step_fn = jax.jit(losses.get_step_fn(sde, model_def, train=True,
                                       optimizer=optimizer))
  batch = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
  new_state, loss = step_fn(state, batch)
  new_state, loss = step_fn(new_state, batch)
  assert int(new_state.step) == 2
  assert np.isfinite(float(loss))
  # params changed (step 1 has lr=0 from warmup; step 2 has lr=lr/warmup > 0)
  deltas = jax.tree.map(lambda a, b: float(np.max(np.abs(np.asarray(a - b)))),
                        new_state.params, state.params)
  assert max(jax.tree.leaves(deltas)) > 0
  assert int(new_state.ema.num_updates) == 2


def test_eval_step_uses_ema_params_and_keeps_state():
  cfg, sde, model_def, state = _setup()
  eval_fn = jax.jit(losses.get_step_fn(sde, model_def, train=False))
  batch = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
  new_state, loss = eval_fn(state, batch)
  assert int(new_state.step) == 0
  assert np.isfinite(float(loss))


def test_n_jitted_steps_scan():
  cfg, sde, model_def, state = _setup()
  optimizer = losses.get_optimizer(cfg)
  n_fn = jax.jit(losses.get_n_step_fn(sde, model_def, train=True,
                                      optimizer=optimizer, n_steps=3))
  batches = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 16, 16, 3))
  new_state, losses_out = n_fn(state, batches)
  assert int(new_state.step) == 3
  assert losses_out.shape == (3,)
  assert np.all(np.isfinite(np.asarray(losses_out)))


def test_warmup_schedule():
  cfg, sde, model_def, state = _setup()
  optimizer = losses.get_optimizer(cfg)
  step_fn = jax.jit(losses.get_step_fn(sde, model_def, train=True,
                                       optimizer=optimizer))
  batch = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  # The first step has lr ≈ 0 (step 0 / warmup): params barely move beyond
  # Adam's epsilon-free direction scaled by tiny lr.
  new_state, _ = step_fn(state, batch)
  delta = jax.tree.map(lambda a, b: np.max(np.abs(np.asarray(a - b))),
                       new_state.params, state.params)
  max_delta = max(jax.tree.leaves(delta))
  assert max_delta < 1e-3  # lr=1e-3 * 0/10 → step size ~0 (+clip)


def test_loss_decreases_on_overfit():
  """A few steps on one tiny batch should reduce the loss."""
  cfg, sde, model_def, state = _setup()
  cfg.optim.warmup = 0
  cfg.optim.lr = 2e-3
  optimizer = losses.get_optimizer(cfg)
  step_fn = jax.jit(losses.get_step_fn(sde, model_def, train=True,
                                       optimizer=optimizer, reduce_mean=True))
  batch = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3)) * 0.5
  first_losses, last_losses = [], []
  for i in range(30):
    state, loss = step_fn(state, batch)
    if i < 5:
      first_losses.append(float(loss))
    if i >= 25:
      last_losses.append(float(loss))
  assert np.mean(last_losses) < np.mean(first_losses)
