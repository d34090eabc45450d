"""Flagship-config learning proof on TPU (VERDICT r2 #1, PARITY evidence).

Trains the REAL CIFAR-10 NCSN++ cont. VE flagship config (bf16, batch 128,
n_jitted=10) at reduced steps on synthetic images whose pixels are iid
N(mu, sigma_d^2) — the perturbed score is closed-form — then checks:

  * loss curve (per-outer-chunk means; must fall well below the untrained
    value of ~1.0 * weighting),
  * learned score vs analytic -(x-mu)/(sigma_d^2+sigma(t)^2) rel-L2 at
    several t,
  * heun + PC sample moments vs (mu, sigma_d).

Prints JSON lines; numbers go into PARITY.md. ~5 min on one v5e chip.

    python tools/learning_proof_tpu.py [n_outer]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MU, SIGMA_D = 0.5, 0.2
BATCH, N_INNER = 128, 10


def main():
  import jax
  import jax.numpy as jnp
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu import losses, sampling, sde as sde_lib
  from score_sde_pytorch_tpu.models import utils as mutils
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  n_outer = int(sys.argv[1]) if len(sys.argv) > 1 else 300

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
    batches = MU + SIGMA_D * jax.random.normal(
        k, (N_INNER, BATCH, size, size, 3))
    state, ls = n_fn(state, batches)
    if first_loss is None:
      first_loss = float(np.asarray(ls)[0])
    if (i + 1) % 30 == 0 or i == 0:
      loss_curve.append(round(float(np.mean(np.asarray(ls))), 4))
      print(json.dumps({"step": (i + 1) * N_INNER,
                        "chunk_loss": loss_curve[-1]}), flush=True)
  train_s = time.time() - t0
  steps = n_outer * N_INNER
  out = {"steps": steps, "train_s": round(train_s, 1),
         "ms_per_step": round(train_s / steps * 1e3, 1),
         "first_step_loss": round(first_loss, 2), "loss_curve": loss_curve}

  # learned score vs analytic
  ema_params = state.ema.params
  score_fn = mutils.get_score_fn(sde, model_def, ema_params, train=False,
                                 continuous=True)
  score_fn = jax.jit(score_fn)
  rng = jax.random.PRNGKey(42)
  rels = {}
  for t_val in (0.05, 0.2, 0.5, 0.9):
    rng, k = jax.random.split(rng)
    sigma_t = float(sde.marginal_prob(jnp.zeros((1, size, size, 3)),
                                      jnp.full((1,), t_val))[1][0])
    var_t = SIGMA_D ** 2 + sigma_t ** 2
    x = MU + np.sqrt(var_t) * jax.random.normal(k, (64, size, size, 3))
    learned = np.asarray(score_fn(x, jnp.full((64,), t_val)), np.float32)
    analytic = np.asarray(-(x - MU) / var_t)
    rels[t_val] = round(float(np.linalg.norm(learned - analytic)
                              / np.linalg.norm(analytic)), 4)
  out["score_rel_err"] = rels
  print(json.dumps({"score_rel_err": rels}), flush=True)

  # sample moments: heun (100 NFE) and PC (reduced N=200)
  def moments(samples):
    s = np.asarray(samples, np.float32)
    return (round(float(s.mean()), 4), round(float(s.std()), 4))

  heun = sampling.get_heun_sampler(sde, model_def, (256, size, size, 3),
                                   lambda x: x, n_steps=50, denoise=True,
                                   continuous=True, eps=1e-5)
  m, s = moments(heun(jax.random.PRNGKey(7), ema_params)[0])
  out["heun_mean"], out["heun_std"] = m, s

  import dataclasses
  pc_sde = dataclasses.replace(sde, N=200)
  pc = sampling.get_pc_sampler(
      pc_sde, model_def, (256, size, size, 3),
      sampling.get_predictor("reverse_diffusion"),
      sampling.get_corrector("langevin"), lambda x: x,
      snr=config.sampling.snr, n_steps=1, continuous=True, denoise=True,
      eps=1e-5)
  m, s = moments(pc(jax.random.PRNGKey(8), ema_params)[0])
  out["pc_mean"], out["pc_std"] = m, s
  out["target_mean"], out["target_std"] = MU, SIGMA_D
  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
