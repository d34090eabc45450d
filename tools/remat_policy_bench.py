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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


N_LO, N_HI = 1, 3


def measure(config, batch, rounds=3):
  from bench import marginal_train_step_ms  # the one shared timing harness

  config.model.dtype = "bfloat16"
  per_step, _ = marginal_train_step_ms(config, batch, N_LO, N_HI, rounds)
  return round(per_step, 1)


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
