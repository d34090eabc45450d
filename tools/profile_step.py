"""Capture and summarize a jax.profiler trace of the flagship fwd / train step.

Works over the axon relay (verified 2026-08). Prints per-HLO-category device
time and the top single ops with effective bandwidth, from the
trace.json.gz — no TensorBoard needed.

    python tools/profile_step.py [fwd|train]
"""
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def capture(mode: str, logdir: str) -> int:
  import jax
  import jax.numpy as jnp
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu import losses, sde as sde_lib
  from score_sde_pytorch_tpu.models import utils as mutils
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  config = get_config()
  config.model.dtype = "bfloat16"
  batch = 128
  reps = 3
  if mode == "fwd":
    model_def, variables = mutils.create_model(config, jax.random.PRNGKey(0))
    params = variables["params"]
    x = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    t = jnp.full((batch,), 25.0, jnp.float32)
    fn = jax.jit(lambda: model_def.apply({"params": params}, x, t,
                                         train=False))
    run = lambda: np.asarray(fn())
  else:
    sde = sde_lib.build_sde(config)
    model_def, state = losses.init_train_state(config, jax.random.PRNGKey(0))
    optimizer = losses.get_optimizer(config)
    step = jax.jit(losses.get_step_fn(
        sde, model_def, train=True, optimizer=optimizer,
        reduce_mean=config.training.reduce_mean,
        continuous=config.training.continuous,
        prng_impl=config.training.get("prng_impl")))
    x = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    holder = {"s": state}

    def run():
      holder["s"], _ = step(holder["s"], x)
      return np.asarray(holder["s"].step)

  run()  # compile
  with jax.profiler.trace(logdir):
    for _ in range(reps):
      run()
  return reps


def summarize(logdir: str, reps: int) -> None:
  paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                    recursive=True)
  if not paths:
    print("no trace file found")
    return
  with gzip.open(paths[-1]) as f:
    data = json.load(f)
  pids = {e["pid"]: e["args"].get("name", "")
          for e in data["traceEvents"]
          if e.get("ph") == "M" and e.get("name") == "process_name"}
  dev_pid = next((p for p, n in pids.items() if "TPU" in n or "GPU" in n),
                 None)
  events = [e for e in data["traceEvents"]
            if e.get("ph") == "X" and e.get("pid") == dev_pid
            and "dur" in e and e.get("args")
            and "hlo_category" in e.get("args", {})]
  bycat = collections.Counter()
  bybytes = collections.Counter()
  for e in events:
    bycat[e["args"]["hlo_category"]] += e["dur"]
    bybytes[e["args"]["hlo_category"]] += int(
        e["args"].get("bytes_accessed", 0))
  total = sum(bycat.values())
  print(f"device op time: {total / reps / 1e3:.2f} ms per iteration")
  for cat, dur in bycat.most_common():
    bw = bybytes[cat] / (dur * 1e-6) / 1e9 if dur else 0.0
    print(f"  {dur / reps / 1e3:7.2f} ms  {cat:<28} eff-BW {bw:6.0f} GB/s")
  ops = collections.Counter()
  info = {}
  for e in events:
    ops[e["name"]] += e["dur"]
    info[e["name"]] = e["args"]
  print("top ops:")
  for name, dur in ops.most_common(10):
    a = info[name]
    print(f"  {dur / reps / 1e3:6.2f} ms  {a.get('hlo_category', '?')[:20]:<20}"
          f" {a.get('tf_op', name)[:80]}")


def main():
  mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
  logdir = tempfile.mkdtemp(prefix=f"jaxtrace_{mode}_")
  reps = capture(mode, logdir)
  summarize(logdir, reps)


if __name__ == "__main__":
  main()
