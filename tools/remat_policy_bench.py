"""Selective-remat policy measurement (VERDICT r2 #8).

Round-2 recorded 460 ms/step for 256px church b32 and 496 ms for 1024px
CelebA-HQ b2 with BLANKET remat (every block rematerialized). Selective
remat (config.model.remat_min_res, models/ncsnpp.py) recomputes only the
high-res levels — the ones whose activations dominate HBM — trading less
backward recompute for slightly more stored memory.

Cases (marginal-cost method, bf16):
  256px b32:  remat_min_res in {0 (=all), 64, 128, off}
  1024px b2:  remat_min_res in {0, 256, 512}   (off OOMs — r2 finding)

    python tools/remat_policy_bench.py [256|1024]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_LO, N_HI = 1, 3


def _force(x):
  import jax
  return np.asarray(jax.tree_util.tree_leaves(x)[0])


def measure(config, batch, rounds=3):
  import jax
  import jax.numpy as jnp
  from score_sde_pytorch_tpu import losses, sde as sde_lib

  config.model.dtype = "bfloat16"
  size = config.data.image_size
  sde = sde_lib.build_sde(config)
  optimizer = losses.get_optimizer(config)

  def timed(n_steps):
    model_def, state = losses.init_train_state(config, jax.random.PRNGKey(0))
    fn = jax.jit(
        losses.get_n_step_fn(sde, model_def, train=True, optimizer=optimizer,
                             n_steps=n_steps,
                             continuous=config.training.continuous,
                             prng_impl=config.training.get("prng_impl")),
        donate_argnums=0)
    batches = jnp.zeros((n_steps, batch, size, size, 3), jnp.float32)
    state, _ = fn(state, batches)
    _force(state.step)
    ts = []
    for _ in range(rounds):
      batches = jnp.zeros((n_steps, batch, size, size, 3), jnp.float32)
      t0 = time.time()
      state, _ = fn(state, batches)
      _force(state.step)
      ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts))

  t_lo, t_hi = timed(N_LO), timed(N_HI)
  return round((t_hi - t_lo) / (N_HI - N_LO), 1)


def main():
  import score_sde_pytorch_tpu.models  # noqa: F401
  which = sys.argv[1] if len(sys.argv) > 1 else "256"
  out = {}

  if which == "256":
    from score_sde_pytorch_tpu.configs.ve.church_ncsnpp_continuous import (
        get_config)
    batch = 32
    cases = [("all", True, 0), ("min64", True, 64), ("min128", True, 128),
             ("off", False, 0)]
  else:
    from score_sde_pytorch_tpu.configs.ve.celebahq_ncsnpp_continuous import (
        get_config)
    batch = 2
    cases = [("all", True, 0), ("min256", True, 256), ("min512", True, 512)]

  for tag, remat, min_res in cases:
    config = get_config()
    config.model.remat = remat
    config.model.remat_min_res = min_res
    try:
      out[tag] = measure(config, batch)
    except Exception as e:  # OOM etc — a recorded negative is still data
      out[tag] = repr(e)[:160]
    print(json.dumps({f"{which}_{tag}": out[tag]}), flush=True)
  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
