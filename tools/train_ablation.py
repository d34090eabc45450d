"""Train-step ablation on TPU: where does the CIFAR NCSN++ step time go?

The axon relay adds a large fixed per-dispatch latency (~50+ ms), so
single-call timings are dominated by overhead. Each case is therefore
measured as the MARGINAL per-step cost of the fused n-step scan:

    per_step_ms = (t(n=N_HI) - t(n=N_LO)) / (N_HI - N_LO)

which cancels dispatch overhead exactly. Cases: the flagship config and
single-axis ablations (no attention, naive resampling, ddpm blocks, no
progressive pyramids); differences bound each component's share of the
step. Also reports the XLA-compiled FLOPs of one step and the implied MFU.

    python tools/train_ablation.py
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


def case_stats(config, batch=128, rounds=5):
  import jax
  import jax.numpy as jnp
  from score_sde_pytorch_tpu import losses, sde as sde_lib

  size = config.data.image_size
  sde = sde_lib.build_sde(config)
  optimizer = losses.get_optimizer(config)

  def timed(n_steps):
    model_def, state = losses.init_train_state(config, jax.random.PRNGKey(0))
    fn = jax.jit(
        losses.get_n_step_fn(sde, model_def, train=True, optimizer=optimizer,
                             n_steps=n_steps,
                             reduce_mean=config.training.reduce_mean,
                             continuous=config.training.continuous,
                             likelihood_weighting=False),
        donate_argnums=0)
    batches = jnp.zeros((n_steps, batch, size, size, 3), jnp.float32)
    flops = 0.0
    try:
      cost = fn.lower(state, batches).compile().cost_analysis()
      if isinstance(cost, (list, tuple)):
        cost = cost[0]
      flops = float(cost.get("flops", 0.0)) / n_steps
    except Exception:
      pass
    state, _ = fn(state, batches)  # compile+warmup consumed the donation
    _force(state.step)
    ts = []
    for _ in range(rounds):
      batches = jnp.zeros((n_steps, batch, size, size, 3), jnp.float32)
      t0 = time.time()
      state, _ = fn(state, batches)
      _force(state.step)
      ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts)), flops

  t_lo, _ = timed(N_LO)
  t_hi, flops = timed(N_HI)
  per_step = (t_hi - t_lo) / (N_HI - N_LO)
  return {"per_step_ms": round(per_step, 2),
          "dispatch_ms": round(t_lo - N_LO * per_step, 1),
          "gflops_per_step": round(flops / 1e9, 1)}


def main():
  import jax
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
      ("full", cfg()),
      ("no_attention", cfg(attn_resolutions=())),
      ("naive_resample", cfg(fir=False)),
      ("ddpm_blocks", cfg(resblock_type="ddpm")),
      ("no_progressive", cfg(progressive="none", progressive_input="none")),
      ("fp32", get_config()),
  ]
  peak = 197e12 if "v5" in getattr(
      jax.devices()[0], "device_kind", "").lower() else None
  out = {}
  for tag, config in cases:
    try:
      out[tag] = case_stats(config)
      if peak and tag == "full":
        out[tag]["mfu"] = round(
            out[tag]["gflops_per_step"] * 1e9 /
            (out[tag]["per_step_ms"] / 1e3) / peak, 4)
    except Exception as e:
      out[tag] = repr(e)[:160]
    print(json.dumps({tag: out[tag]}), flush=True)
  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
