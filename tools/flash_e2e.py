"""E2E flash-attention measurement on the 256px church config (VERDICT r2 #6).

Three cases, marginal-cost timed ((t_hi-t_lo)/Δn of an n-step train scan)
on the real 256px LSUN-church NCSN++ at batch 8 bf16:

  attn16        shipped config, attn_resolutions=(16,)   — no 32² attention
  attn1632_dense  multiattn config with FLASH_MIN_N forced high — dense 32²
  attn1632_flash  multiattn config, Pallas flash kernel at the 32² grids

    python tools/flash_e2e.py

The delta between the last two is the kernel's e2e contribution; the delta
to the first is the cost of the extra attention capability itself.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_LO, N_HI = 1, 4
BATCH = 8


def _force(x):
  import jax
  return np.asarray(jax.tree_util.tree_leaves(x)[0])


def measure(config):
  import jax
  import jax.numpy as jnp
  from score_sde_pytorch_tpu import losses, sde as sde_lib

  config.model.dtype = "bfloat16"
  size = config.data.image_size
  sde = sde_lib.build_sde(config)
  optimizer = losses.get_optimizer(config)

  def timed(n_steps, rounds=4):
    model_def, state = losses.init_train_state(config, jax.random.PRNGKey(0))
    fn = jax.jit(
        losses.get_n_step_fn(sde, model_def, train=True, optimizer=optimizer,
                             n_steps=n_steps,
                             continuous=config.training.continuous,
                             prng_impl=config.training.get("prng_impl")),
        donate_argnums=0)
    batches = jnp.zeros((n_steps, BATCH, size, size, 3), jnp.float32)
    state, _ = fn(state, batches)
    _force(state.step)
    ts = []
    for _ in range(rounds):
      batches = jnp.zeros((n_steps, BATCH, size, size, 3), jnp.float32)
      t0 = time.time()
      state, _ = fn(state, batches)
      _force(state.step)
      ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts))

  t_lo, t_hi = timed(N_LO), timed(N_HI)
  return round((t_hi - t_lo) / (N_HI - N_LO), 1)


def main():
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu.ops import attention as attn_ops
  from score_sde_pytorch_tpu.configs.ve.church_ncsnpp_continuous import (
      get_config as church)
  from score_sde_pytorch_tpu.configs.tpu.church_ncsnpp_continuous_multiattn \
      import get_config as church_multi

  out = {}
  out["attn16"] = measure(church())
  print(json.dumps({"attn16": out["attn16"]}), flush=True)

  orig = attn_ops.FLASH_MIN_N
  attn_ops.FLASH_MIN_N = 1 << 30  # force the dense path at every grid
  try:
    out["attn1632_dense"] = measure(church_multi())
  finally:
    attn_ops.FLASH_MIN_N = orig
  print(json.dumps({"attn1632_dense": out["attn1632_dense"]}), flush=True)

  out["attn1632_flash"] = measure(church_multi())
  print(json.dumps({"attn1632_flash": out["attn1632_flash"]}), flush=True)
  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
