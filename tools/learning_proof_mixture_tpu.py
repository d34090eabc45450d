"""Flagship-config TWO-MODE learning proof on TPU (round-3 deepening of
tools/learning_proof_tpu.py; VERDICT r2 #1 follow-through).

The iid-Gaussian proof shows the net learns a *unimodal pixel-local* score.
This one trains the REAL CIFAR-10 NCSN++ cont. VE flagship config (bf16,
batch 128) on a bimodal distribution where the score depends on a GLOBAL
image statistic — the classic diffusion failure axis (mode collapse /
mode imbalance):

  per image: mode k ~ Bernoulli(1/2);  x0 = mu_k * 1 + sigma_d * z

  p_t(x) = sum_k w_k N(x; mu_k 1, v_t I),   v_t = sigma_d^2 + sigma(t)^2
  responsibilities r_k(x) = softmax_k( -||x - mu_k||^2 / (2 v_t) + log w_k )
  score_i(x, t) = -(x_i - sum_k r_k(x) mu_k) / v_t       (closed form)

The mode posterior r_k mixes ALL pixels, so matching this score proves the
network integrates global context (reference capability under proof:
losses.py:55-101 training + sampling.py:355-485 samplers producing the
data distribution — here checkable exactly, unlike FID).

Checks printed as JSON lines (numbers go into PARITY.md):
  * loss curve falls well below the untrained value,
  * learned score vs analytic mixture score rel-L2 at several t
    (on x ~ p_t, i.e. including points near the decision boundary at
    large sigma where r is soft),
  * PC (N=200) and DPM-Solver++ (20 steps) samples: per-image mode
    fraction ~ 1/2 (no mode collapse), within-mode mean/std ~ (mu_k,
    sigma_d), cross-mode separation preserved.

    python tools/learning_proof_mixture_tpu.py [n_outer]
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MU0, MU1, SIGMA_D = 0.25, 0.75, 0.1
BATCH, N_INNER = 128, 10


def make_batch(jax, jnp, key, shape):
  """(n, b, h, w, c) images: per-image mode, iid pixel noise around it."""
  k_mode, k_noise = jax.random.split(key)
  n, b = shape[0], shape[1]
  mode = jax.random.bernoulli(k_mode, 0.5, (n, b))          # (n, b)
  mu = jnp.where(mode, MU1, MU0)[:, :, None, None, None]
  return mu + SIGMA_D * jax.random.normal(k_noise, shape)


def analytic_score(np_mod, x, var_t):
  """Closed-form mixture score for x of shape (b, h, w, c)."""
  b = x.shape[0]
  flat = x.reshape(b, -1)
  # log responsibilities (equal weights cancel)
  l0 = -np_mod.sum((flat - MU0) ** 2, -1) / (2 * var_t)
  l1 = -np_mod.sum((flat - MU1) ** 2, -1) / (2 * var_t)
  m = np_mod.maximum(l0, l1)
  e0, e1 = np_mod.exp(l0 - m), np_mod.exp(l1 - m)
  r1 = e1 / (e0 + e1)
  mu_post = (MU0 + (MU1 - MU0) * r1)[:, None, None, None]
  return -(x - mu_post) / var_t


def mode_stats(samples):
  """Per-image mode split + within-mode pixel moments."""
  s = np.asarray(samples, np.float32)
  img_mean = s.reshape(s.shape[0], -1).mean(-1)
  hi = img_mean > (MU0 + MU1) / 2
  out = {"frac_hi": round(float(hi.mean()), 4)}
  for name, sel, mu in (("lo", ~hi, MU0), ("hi", hi, MU1)):
    if sel.sum() == 0:
      out[f"{name}_mean"] = None
      continue
    grp = s[sel]
    out[f"{name}_mean"] = round(float(grp.mean()), 4)
    out[f"{name}_std"] = round(float(grp.std()), 4)
    out[f"{name}_target_mean"] = mu
  return out


def main():
  import jax
  import jax.numpy as jnp
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu import losses, sampling, sde as sde_lib
  from score_sde_pytorch_tpu.models import utils as mutils
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  n_outer = int(sys.argv[1]) if len(sys.argv) > 1 else 400

  config = get_config()
  config.model.dtype = "bfloat16"
  size = config.data.image_size
  sde = sde_lib.build_sde(config)
  optimizer = losses.get_optimizer(config)
  model_def, state = losses.init_train_state(config, jax.random.PRNGKey(0))
  n_fn = jax.jit(
      losses.get_n_step_fn(sde, model_def, train=True, optimizer=optimizer,
                           n_steps=N_INNER,
                           reduce_mean=config.training.reduce_mean,
                           continuous=True,
                           prng_impl=config.training.get("prng_impl")),
      donate_argnums=0)

  data_rng = jax.random.PRNGKey(1)
  loss_curve, first_loss = [], None
  t0 = time.time()
  for i in range(n_outer):
    data_rng, k = jax.random.split(data_rng)
    batches = make_batch(jax, jnp, k, (N_INNER, BATCH, size, size, 3))
    state, ls = n_fn(state, batches)
    if first_loss is None:
      first_loss = float(np.asarray(ls)[0])
    if (i + 1) % 40 == 0 or i == 0:
      loss_curve.append(round(float(np.mean(np.asarray(ls))), 4))
      print(json.dumps({"step": (i + 1) * N_INNER,
                        "chunk_loss": loss_curve[-1]}), flush=True)
  train_s = time.time() - t0
  steps = n_outer * N_INNER
  out = {"steps": steps, "train_s": round(train_s, 1),
         "ms_per_step": round(train_s / steps * 1e3, 1),
         "first_step_loss": round(first_loss, 2), "loss_curve": loss_curve}

  # learned score vs analytic mixture score on x ~ p_t
  ema_params = state.ema.params
  score_fn = jax.jit(mutils.get_score_fn(sde, model_def, ema_params,
                                         train=False, continuous=True))
  rng = jax.random.PRNGKey(42)
  rels = {}
  for t_val in (0.05, 0.2, 0.5, 0.9):
    rng, k1, k2 = jax.random.split(rng, 3)
    sigma_t = float(sde.marginal_prob(jnp.zeros((1, size, size, 3)),
                                      jnp.full((1,), t_val))[1][0])
    var_t = SIGMA_D ** 2 + sigma_t ** 2
    mode = jax.random.bernoulli(k1, 0.5, (64,))
    mu = jnp.where(mode, MU1, MU0)[:, None, None, None]
    x = np.asarray(mu + np.sqrt(var_t)
                   * jax.random.normal(k2, (64, size, size, 3)), np.float32)
    learned = np.asarray(score_fn(x, jnp.full((64,), t_val)), np.float32)
    analytic = analytic_score(np, x, var_t)
    rels[t_val] = round(float(np.linalg.norm(learned - analytic)
                              / np.linalg.norm(analytic)), 4)
  out["score_rel_err"] = rels
  print(json.dumps({"score_rel_err": rels}), flush=True)

  # samplers: PC (reduced N=200) and DPM-Solver++(2M) 20 steps
  shape = (256, size, size, 3)
  pc_sde = dataclasses.replace(sde, N=200)
  pc = sampling.get_pc_sampler(
      pc_sde, model_def, shape,
      sampling.get_predictor("reverse_diffusion"),
      sampling.get_corrector("langevin"), lambda x: x,
      snr=config.sampling.snr, n_steps=1, continuous=True, denoise=True,
      eps=1e-5)
  out["pc"] = mode_stats(pc(jax.random.PRNGKey(8), ema_params)[0])
  print(json.dumps({"pc": out["pc"]}), flush=True)

  dpmpp = sampling.get_dpmpp_sampler(sde, model_def, shape, lambda x: x,
                                     n_steps=20, continuous=True, eps=1e-5)
  out["dpmpp"] = mode_stats(dpmpp(jax.random.PRNGKey(9), ema_params)[0])
  out["targets"] = {"frac_hi": 0.5, "mu": [MU0, MU1], "sigma_d": SIGMA_D}
  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
