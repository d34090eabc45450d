"""MFU buy-back experiments vs the 19.5% r2 baseline (VERDICT r2 #2).

Round-2 profiling (tools/profile_step.py) pinned 80% of the 63 ms flagship
train step inside XLA conv fusions at 40-50% per-conv MXU utilization. This
harness measures every avenue the verdict named, all with the marginal-cost
method ((t12-t2)/10 of an n-step scan — removes the ~50 ms axon dispatch):

  (a) train-side batch sweep 64/128/256/512 bf16 — is 128 still optimal
      after the GroupNorm HBM savings?
  (b) conv/matmul precision matrix: bf16 model (baseline) vs fp32 model
      under jax.default_matmul_precision in {bfloat16, tensorfloat32,
      float32} (fp32 convs on TPU decompose into 1/3/6 bf16 MXU passes).
  (c) XLA TPU compiler-option sweep: latency-hiding scheduler, scoped-vmem
      budget for fusions. Client-side XLA_FLAGS with TPU-only names fatals
      in parse_flags_from_env on relayed backends (the client binary is CPU
      XLA — r3's blocked experiment); these now travel server-side via
      ``lowered.compile(compiler_options=...)``, which works through the
      relay.

Per-case output: one JSON line {case, per_step_ms, imgs_per_s, mfu}.
MFU uses marginal FLOPs ((flops12-flops2)/10 from XLA cost analysis) over
the chip's bf16 peak.

    python tools/mfu_experiments.py            # orchestrate all cases
    python tools/mfu_experiments.py CASE       # one case, in-process
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


N_LO, N_HI = 2, 12

# (a) + (b): in-process cases.
CASES = {
    # batch sweep, bf16
    "b64": dict(batch=64, dtype="bfloat16"),
    "b128": dict(batch=128, dtype="bfloat16"),
    "b256": dict(batch=256, dtype="bfloat16"),
    "b512": dict(batch=512, dtype="bfloat16"),
    # precision matrix at batch 128
    "f32_prec_bf16": dict(batch=128, dtype="float32",
                          matmul_precision="bfloat16"),
    "f32_prec_tf32": dict(batch=128, dtype="float32",
                          matmul_precision="tensorfloat32"),
    "f32_prec_f32": dict(batch=128, dtype="float32",
                         matmul_precision="float32"),
}

# (c): compiler-option cases — server-side options on the b128 executable.
OPTION_CASES = {
    "opt_lhs_on": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "opt_vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "opt_vmem_128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
}


def run_case(batch=128, dtype="bfloat16", matmul_precision=None, rounds=5,
             compiler_options=None):
  import jax
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)
  from bench import _peak_flops, marginal_train_step_ms

  config = get_config()
  config.model.dtype = dtype

  import contextlib
  prec_ctx = (jax.default_matmul_precision(matmul_precision)
              if matmul_precision else contextlib.nullcontext())
  with prec_ctx:
    per_step_ms, per_step_flops = marginal_train_step_ms(
        config, batch, N_LO, N_HI, rounds, with_flops=True,
        compiler_options=compiler_options)

  peak, kind = _peak_flops(jax.devices()[0])
  # cost_analysis flops cover the whole program while `peak` is per-chip:
  # normalize per chip (same as bench.py) so numbers stay comparable with
  # the headline mfu_bf16_train on multi-chip hosts.
  per_chip_flops = per_step_flops / jax.device_count()
  mfu = (per_chip_flops / (per_step_ms / 1e3) / peak
         if per_chip_flops > 0 and per_step_ms > 0 else None)
  return {"per_step_ms": round(per_step_ms, 2),
          "imgs_per_s": round(batch / (per_step_ms / 1e3), 1),
          "mfu": round(mfu, 4) if mfu else None,
          "flops_per_step": per_step_flops,
          "peak_kind": kind}


RESULTS_PATH = os.path.join(os.path.dirname(__file__), "..",
                            "mfu_results.json")


def main():
  if len(sys.argv) > 1 and sys.argv[1] != "all":
    case = sys.argv[1]
    if case in OPTION_CASES:
      out = run_case(batch=128, dtype="bfloat16",
                     compiler_options=OPTION_CASES[case])
    else:
      out = run_case(**CASES[case])
    print("CASE " + json.dumps({case: out}), flush=True)
    return

  # Results are appended to mfu_results.json after EVERY case so a timeout
  # or crash never loses completed measurements.
  results = {}
  if os.path.exists(RESULTS_PATH):
    results = json.load(open(RESULTS_PATH))

  def record(tag, value):
    results[tag] = value
    json.dump(results, open(RESULTS_PATH, "w"), indent=1)
    print(json.dumps({tag: value}), flush=True)

  env = dict(os.environ)
  for case in CASES:
    if case in results and "error" not in str(results[case]):
      continue
    proc = subprocess.run([sys.executable, __file__, case], env=env,
                          capture_output=True, text=True, timeout=3600)
    record(case, _parse(proc, case))
  for tag in OPTION_CASES:
    if tag in results and "error" not in str(results[tag]):
      continue
    proc = subprocess.run([sys.executable, __file__, tag], env=env,
                          capture_output=True, text=True, timeout=3600)
    record(tag, _parse(proc, tag))
  print("FINAL " + json.dumps(results), flush=True)


def _parse(proc, case):
  for line in proc.stdout.splitlines():
    if line.startswith("CASE "):
      return json.loads(line[5:])[case]
  return {"error": (proc.stderr or proc.stdout)[-300:]}


if __name__ == "__main__":
  main()
