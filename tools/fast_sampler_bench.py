"""Fast-sampler throughput: heun vs DPM-Solver++(2M) on the flagship config.

Both integrate the probability-flow ODE deterministically; heun spends
2 NFE/step (measured r2: 69.5 samples/s/chip at 50 steps = 101 NFE),
dpmpp spends 1 NFE/step and its multistep data-prediction form usually
holds quality down to ~10-20 steps. Batch 64 bf16 (the measured-optimal
sampling batch), median of `rounds` timed runs after warmup.

    python tools/fast_sampler_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _force(x):
  import jax
  return np.asarray(jax.tree_util.tree_leaves(x)[0])


def main():
  import jax
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu import sampling, sde as sde_lib
  from score_sde_pytorch_tpu.models import utils as mutils
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  on_accel = jax.devices()[0].platform != "cpu"
  config = get_config()
  config.model.dtype = "bfloat16" if on_accel else "float32"
  batch = 64 if on_accel else 4
  if not on_accel:
    config.model.nf = 16
    config.model.num_res_blocks = 1
  size = config.data.image_size
  shape = (batch, size, size, 3)
  sde = sde_lib.build_sde(config)
  model_def, variables = mutils.create_model(config, jax.random.PRNGKey(0))
  params = variables["params"]

  cases = {
      "heun50": sampling.get_heun_sampler(
          sde, model_def, shape, lambda x: x, n_steps=50, denoise=True,
          continuous=True, eps=1e-5),
      "dpmpp20": sampling.get_dpmpp_sampler(
          sde, model_def, shape, lambda x: x, n_steps=20, denoise=True,
          continuous=True, eps=1e-5),
      "dpmpp10": sampling.get_dpmpp_sampler(
          sde, model_def, shape, lambda x: x, n_steps=10, denoise=True,
          continuous=True, eps=1e-5),
      # stochastic variant: same NFE, one extra rng draw per step — the
      # per-sampler cost delta should be noise-level.
      "sde_dpmpp20": sampling.get_dpmpp_sampler(
          sde, model_def, shape, lambda x: x, n_steps=20, denoise=True,
          continuous=True, eps=1e-5, stochastic=True),
  }
  rounds = 5 if on_accel else 1
  out = {}
  rng = jax.random.PRNGKey(0)
  for tag, fn in cases.items():
    samples, nfe = fn(rng, params)
    _force(samples)  # compile + warmup
    ts = []
    for i in range(rounds):
      t0 = time.time()
      _force(fn(jax.random.fold_in(rng, i), params)[0])
      ts.append(time.time() - t0)
    t = float(np.median(ts))
    out[tag] = {"nfe": int(nfe),
                "samples_per_s_per_chip":
                    round(batch / t / jax.device_count(), 2),
                "s_per_batch": round(t, 3)}
    print(json.dumps({tag: out[tag]}), flush=True)
  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
