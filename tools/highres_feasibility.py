"""High-resolution feasibility probe on one TPU chip.

Runs one full training step (fwd+bwd+Adam+EMA) of the 1024px CelebA-HQ
NCSN++ config (reference configs/ve/celebahq_ncsnpp_continuous.py — nf=16,
8-level ch_mult pyramid, remat) and the 256px church config at their
reference batch sizes, on the real chip, and reports step time and HBM
usage. The reference needs 4x V100-32GB for the 1024px config; this script
demonstrates (or refutes) single-v5e feasibility via remat + bf16.

    python tools/highres_feasibility.py [--skip-1024] [--skip-256]
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


def probe(config, batch, tag, dtype):
  import jax
  import jax.numpy as jnp
  from score_sde_pytorch_tpu import losses, sde as sde_lib

  config.model.dtype = dtype
  config.training.batch_size = batch
  sde = sde_lib.build_sde(config)
  model_def, state = losses.init_train_state(config, jax.random.PRNGKey(0))
  optimizer = losses.get_optimizer(config)
  step = jax.jit(
      losses.get_step_fn(sde, model_def, train=True, optimizer=optimizer,
                         reduce_mean=config.training.reduce_mean,
                         continuous=config.training.continuous,
                         prng_impl=config.training.get("prng_impl")),
      donate_argnums=0)
  size = config.data.image_size
  x = jnp.zeros((batch, size, size, 3), jnp.float32)
  t0 = time.time()
  state, loss = step(state, x)
  _force(state.step)
  compile_s = time.time() - t0
  ts = []
  for _ in range(3):
    t0 = time.time()
    state, loss = step(state, x)
    _force(state.step)
    ts.append(time.time() - t0)
  mem = {}
  try:
    stats = jax.local_devices()[0].memory_stats() or {}
    mem = {k: round(v / 2**30, 3) for k, v in stats.items()
           if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}
  except Exception:
    pass
  print(json.dumps({tag: {
      "batch": batch, "dtype": dtype,
      "step_ms": round(float(np.median(ts)) * 1e3, 1),
      "compile_s": round(compile_s, 1), "loss": round(float(loss), 4),
      "mem_gib": mem}}), flush=True)


def main():
  from score_sde_pytorch_tpu.configs.ve.celebahq_ncsnpp_continuous import (
      get_config as cfg_1024)
  from score_sde_pytorch_tpu.configs.ve.church_ncsnpp_continuous import (
      get_config as cfg_256)
  import score_sde_pytorch_tpu.models  # noqa: F401

  if "--skip-256" not in sys.argv:
    # reference batch 128 across devices; per-chip share on 4 chips = 32
    probe(cfg_256(), 32, "church_256px_bf16", "bfloat16")
  if "--skip-1024" not in sys.argv:
    # Measured on v5e (2026-08): batch 1 compiles and steps at ~267 ms
    # (bf16 + remat); batch >= 2 exceeds the chip's HBM at compile time.
    # The reference's global batch 8 maps to 8-chip DP (per-chip batch 1),
    # which is what the multichip dryrun exercises.
    for b in (2, 1):
      try:
        probe(cfg_1024(), b, f"celebahq_1024px_b{b}_bf16", "bfloat16")
        break
      except Exception as e:
        print(json.dumps({f"celebahq_1024px_b{b}_bf16":
                          {"error": repr(e)[:160]}}), flush=True)


if __name__ == "__main__":
  main()
