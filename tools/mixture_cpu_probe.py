"""Probe: mode balance of deterministic samplers on the tiny mixture task.

Trains the tiny-NCSN++ mixture fixture (as tests/test_learning.py) for a
configurable budget, then reports per-sampler mode fractions:
heun@50, dpmpp@{10,20,40}, PC@200. Diagnoses whether the dpmpp
imbalance is solver-specific or a score-accuracy(t→1) / budget effect.

    python tools/mixture_cpu_probe.py [n_outer=60]
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# The image sitecustomize's jax.config.update("jax_platforms", "axon,cpu")
# overrides the env var — re-assert CPU before any backend initializes.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from score_sde_pytorch_tpu import losses, sampling, sde as sde_lib
import score_sde_pytorch_tpu.models  # noqa: F401

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_models import tiny_config  # noqa: E402
import ml_collections  # noqa: E402

MU0, MU1, SIG = 0.2, 0.8, 0.1
SHAPE = (8, 8, 1)


def main():
  n_outer = int(sys.argv[1]) if len(sys.argv) > 1 else 60
  cfg = tiny_config(image_size=8)
  cfg.data.num_channels = 1
  cfg.training.sde = "vesde"
  cfg.training.continuous = True
  cfg.model.dropout = 0.0
  cfg.model.attn_resolutions = (4,)
  cfg.model.num_scales = 200
  cfg.model.sigma_max = 5.0
  cfg.model.sigma_min = 0.1
  cfg.optim = ml_collections.ConfigDict({
      "optimizer": "Adam", "lr": 2e-3, "beta1": 0.9, "eps": 1e-8,
      "warmup": 100, "grad_clip": 1.0, "weight_decay": 0})

  sde = sde_lib.build_sde(cfg)
  model_def, state = losses.init_train_state(cfg, jax.random.PRNGKey(5))
  optimizer = losses.get_optimizer(cfg)
  n_fn = jax.jit(losses.get_n_step_fn(sde, model_def, train=True,
                                      optimizer=optimizer, n_steps=25,
                                      reduce_mean=True))
  data_rng = jax.random.PRNGKey(6)
  for i in range(n_outer):
    data_rng, k = jax.random.split(data_rng)
    km, kn = jax.random.split(k)
    mode = jax.random.bernoulli(km, 0.5, (25, 128))
    mu = jnp.where(mode, MU1, MU0)[:, :, None, None, None]
    state, ls = n_fn(state, mu + SIG * jax.random.normal(
        kn, (25, 128) + SHAPE))
    if (i + 1) % 20 == 0:
      print(json.dumps({"outer": i + 1,
                        "loss": round(float(jnp.mean(ls)), 4)}), flush=True)

  params = state.ema.params

  def frac(samples):
    s = np.asarray(samples, np.float32)
    m = s.reshape(s.shape[0], -1).mean(-1)
    return round(float((m > 0.5).mean()), 4)

  out = {"n_outer": n_outer}
  fn = sampling.get_heun_sampler(sde, model_def, (256,) + SHAPE,
                                 lambda x: x, n_steps=50, denoise=True,
                                 continuous=True, eps=1e-5)
  out["heun50"] = frac(fn(jax.random.PRNGKey(13), params)[0])
  for n in (10, 20, 40):
    fn = sampling.get_dpmpp_sampler(sde, model_def, (256,) + SHAPE,
                                    lambda x: x, n_steps=n, denoise=True,
                                    continuous=True, eps=1e-5)
    out[f"dpmpp{n}"] = frac(fn(jax.random.PRNGKey(13), params)[0])
  for n in (10, 20, 40, 100):
    fn = sampling.get_dpmpp_sampler(sde, model_def, (256,) + SHAPE,
                                    lambda x: x, n_steps=n, denoise=True,
                                    continuous=True, eps=1e-5,
                                    stochastic=True)
    out[f"sde_dpmpp{n}"] = frac(fn(jax.random.PRNGKey(13), params)[0])
  fn = sampling.get_pc_sampler(
      sde, model_def, (256,) + SHAPE,
      sampling.get_predictor("reverse_diffusion"),
      sampling.get_corrector("langevin"), lambda x: x, snr=0.16,
      n_steps=1, continuous=True, denoise=True, eps=1e-5)
  out["pc200"] = frac(fn(jax.random.PRNGKey(13), params)[0])
  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
