"""Controllable-generation throughput on TPU: inpainting + colorization.

Drives get_pc_inpainter / get_pc_colorizer on the flagship CIFAR-10 NCSN++
cont. VE config (bf16, batch 64, full N=1000 PC chain with Langevin
corrector = 2000 NFE + per-step projections) and reports samples/s/chip —
the subsystem's first recorded TPU numbers (the per-step data-consistency
projection is fused into the same scanned PC body, so the expectation is
~PC-sampling speed).

    python tools/controllable_bench.py
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
  import jax.numpy as jnp
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu import (controllable_generation as cg, sampling,
                                     sde as sde_lib)
  from score_sde_pytorch_tpu.models import utils as mutils
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  on_accel = jax.devices()[0].platform != "cpu"
  config = get_config()
  config.model.dtype = "bfloat16" if on_accel else "float32"
  batch = 64 if on_accel else 2
  if not on_accel:
    config.model.nf = 16
    config.model.num_res_blocks = 1
    config.model.num_scales = 10
  size = config.data.image_size
  shape = (batch, size, size, 3)
  sde = sde_lib.build_sde(config)
  model_def, variables = mutils.create_model(config, jax.random.PRNGKey(0))
  params = variables["params"]
  predictor = sampling.get_predictor("reverse_diffusion")
  corrector = sampling.get_corrector("langevin")

  data = jax.random.uniform(jax.random.PRNGKey(1), shape)
  mask = jnp.ones(shape).at[:, :, size // 2:, :].set(0.0)
  gray = jnp.tile(jnp.mean(data, axis=-1, keepdims=True), (1, 1, 1, 3))

  inpainter = cg.get_pc_inpainter(sde, model_def, predictor, corrector,
                                  lambda x: x, snr=config.sampling.snr,
                                  continuous=True)
  colorizer = cg.get_pc_colorizer(sde, model_def, predictor, corrector,
                                  lambda x: x, snr=config.sampling.snr,
                                  continuous=True)
  rounds = 3 if on_accel else 1
  out = {"batch": batch, "N": int(sde.N)}
  for tag, fn, args in (("inpaint", inpainter, (params, data, mask)),
                        ("colorize", colorizer, (params, gray))):
    rng = jax.random.PRNGKey(2)
    _force(fn(rng, *args))  # compile + warmup
    ts = []
    for i in range(rounds):
      t0 = time.time()
      _force(fn(jax.random.fold_in(rng, i), *args))
      ts.append(time.time() - t0)
    t = float(np.median(ts))
    out[tag] = {"samples_per_s_per_chip":
                    round(batch / t / jax.device_count(), 2),
                "s_per_batch": round(t, 3)}
    print(json.dumps({tag: out[tag]}), flush=True)
  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
