"""Train-step ablation round 2: why is the step overhead/bandwidth-bound?

Round 1 (tools/train_ablation.py) showed a flat profile across architecture
axes (77-86 ms marginal per step, batch 128 bf16) and bf16 only 16% faster
than fp32 — i.e. the step is not matmul-bound. This round probes the
non-matmul suspects, all with the marginal-cost method:

  full       re-measure of the flagship step
  dropout0   no dropout masks (kills the per-resblock RNG + mask traffic)
  rbg        state.rng uses the 'rbg' PRNG impl (TPU hardware RNG) instead
             of threefry (software ALU emulation)
  rbg_drop0  both
  batch64    full at batch 64 (halves if compute-bound, flat if fixed-cost)
  fwd_scan   scanned eval step (train=False): forward-only marginal cost

    python tools/train_ablation2.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_LO, N_HI = 2, 12


def _force(x):
  import jax
  return np.asarray(jax.tree_util.tree_leaves(x)[0])


def case_stats(config, batch=128, rounds=5, rbg=False, train=True):
  import jax
  import jax.numpy as jnp
  from score_sde_pytorch_tpu import losses, sde as sde_lib

  size = config.data.image_size
  sde = sde_lib.build_sde(config)
  optimizer = losses.get_optimizer(config)

  def timed(n_steps):
    model_def, state = losses.init_train_state(config, jax.random.PRNGKey(0))
    if rbg:
      state = state.replace(rng=jax.random.key(0, impl="rbg"))
    fn = jax.jit(
        losses.get_n_step_fn(sde, model_def, train=train,
                             optimizer=optimizer, n_steps=n_steps,
                             reduce_mean=config.training.reduce_mean,
                             continuous=config.training.continuous,
                             likelihood_weighting=False),
        donate_argnums=0)
    batches = jnp.zeros((n_steps, batch, size, size, 3), jnp.float32)
    state, _ = fn(state, batches)
    _force(state.step if train else state.rng)
    ts = []
    for _ in range(rounds):
      batches = jnp.zeros((n_steps, batch, size, size, 3), jnp.float32)
      t0 = time.time()
      state, _ = fn(state, batches)
      _force(state.step if train else state.rng)
      ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts))

  t_lo = timed(N_LO)
  t_hi = timed(N_HI)
  per_step = (t_hi - t_lo) / (N_HI - N_LO)
  return {"per_step_ms": round(per_step, 2),
          "dispatch_ms": round(t_lo - N_LO * per_step, 1)}


def main():
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  def cfg(**model_overrides):
    c = get_config()
    c.model.dtype = "bfloat16"
    for k, v in model_overrides.items():
      setattr(c.model, k, v)
    return c

  cases = [
      ("full", dict(config=cfg())),
      ("dropout0", dict(config=cfg(dropout=0.0))),
      ("rbg", dict(config=cfg(), rbg=True)),
      ("rbg_drop0", dict(config=cfg(dropout=0.0), rbg=True)),
      ("batch64", dict(config=cfg(), batch=64)),
      ("fwd_scan", dict(config=cfg(), train=False)),
  ]
  out = {}
  for tag, kw in cases:
    try:
      out[tag] = case_stats(**kw)
    except Exception as e:
      out[tag] = repr(e)[:160]
    print(json.dumps({tag: out[tag]}), flush=True)
  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
