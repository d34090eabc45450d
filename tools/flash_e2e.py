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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


N_LO, N_HI = 1, 4
BATCH = 8


def measure(config):
  from bench import marginal_train_step_ms  # the one shared timing harness

  config.model.dtype = "bfloat16"
  per_step, _ = marginal_train_step_ms(config, BATCH, N_LO, N_HI, rounds=4)
  return round(per_step, 1)


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
