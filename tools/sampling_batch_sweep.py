"""Sweep PC-sampling batch size on TPU for the flagship config.

The headline bench metric is samples/s/chip of the 2000-NFE PC chain; batch
64 was previously A/B-measured better than 128 (3.63 vs 3.18). This sweeps a
finer grid to find the true optimum (VMEM/HBM working-set cliff).

    python tools/sampling_batch_sweep.py [batches...]
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


def throughput(config, batch, rounds=3):
  import jax
  from score_sde_pytorch_tpu import sampling, sde as sde_lib
  from score_sde_pytorch_tpu.models import utils as mutils

  sde = sde_lib.build_sde(config)
  shape = (batch, config.data.image_size, config.data.image_size, 3)
  model_def, variables = mutils.create_model(config, jax.random.PRNGKey(0))
  params = variables["params"]
  sampler = sampling.get_pc_sampler(
      sde, model_def, shape,
      sampling.get_predictor(config.sampling.predictor),
      sampling.get_corrector(config.sampling.corrector), lambda x: x,
      snr=config.sampling.snr, n_steps=config.sampling.n_steps_each,
      probability_flow=False, continuous=True, denoise=True)
  rng = jax.random.PRNGKey(0)
  _force(sampler(rng, params)[0])  # compile + warmup
  ts = []
  for i in range(rounds):
    t0 = time.time()
    _force(sampler(jax.random.fold_in(rng, i), params)[0])
    ts.append(time.time() - t0)
  return batch / float(np.median(ts)) / jax.device_count()


def main():
  import jax
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  batches = [int(b) for b in sys.argv[1:]] or [32, 48, 64, 80, 96]
  on_accel = jax.devices()[0].platform != "cpu"
  out = {}
  for batch in batches:
    config = get_config()
    config.model.dtype = "bfloat16" if on_accel else "float32"
    if not on_accel:
      config.model.nf = 16
      config.model.num_res_blocks = 1
      config.model.num_scales = 10
      batch = min(batch, 4)
    try:
      out[str(batch)] = round(throughput(config, batch), 4)
    except Exception as e:
      out[str(batch)] = repr(e)[:120]
    print(json.dumps({str(batch): out[str(batch)]}), flush=True)
  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
