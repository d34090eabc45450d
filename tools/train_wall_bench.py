"""Wall-clock train-LOOP throughput through the real CLI (run_lib.train).

bench.py measures the marginal device cost of the jitted n-step scan
(63 ms/step); this measures what a user actually gets from
`python -m score_sde_pytorch_tpu.main --mode train`: the full loop with
host data prep, relay dispatch, logging, and any per-iteration syncs.
The gap between the two is loop overhead — the thing the pipelined loop
(async dispatch + deferred loss fetch + batch prep overlap) removes.

Runs the flagship CIFAR-10 NCSN++ cont. VE config (bf16, batch 128,
n_jitted from config) on the synthetic dataset for `n_iters` steps,
parses the `(X s/step)` log lines, and reports the median of the
post-warmup lines (first line includes compile; dropped).

    python tools/train_wall_bench.py [n_iters] [log_freq] [config] [batch]
"""
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.join(os.path.dirname(__file__), "..")


def main():
  n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 600
  log_freq = int(sys.argv[2]) if len(sys.argv) > 2 else 100
  config = (sys.argv[3] if len(sys.argv) > 3 else
            "score_sde_pytorch_tpu/configs/ve/cifar10_ncsnpp_continuous.py")
  batch = int(sys.argv[4]) if len(sys.argv) > 4 else 128
  workdir = tempfile.mkdtemp(prefix="train_wall_")
  cmd = [
      sys.executable, "-m", "score_sde_pytorch_tpu.main",
      "--config", config,
      "--workdir", workdir, "--mode", "train",
      f"--config.training.batch_size={batch}",
      f"--config.training.n_iters={n_iters}",
      f"--config.training.log_freq={log_freq}",
      "--config.training.eval_freq=1000000",
      "--config.training.snapshot_freq=1000000",
      "--config.training.snapshot_freq_for_preemption=1000000",
      "--config.training.snapshot_sampling=False",
      "--config.model.dtype=bfloat16",
  ]
  proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                        timeout=3600)
  lines = re.findall(r"training_loss: ([\d.e+-]+) \(([\d.]+) s/step\)",
                     proc.stdout + proc.stderr)
  if len(lines) < 3:
    print("FAILED; tail of output:\n" +
          (proc.stdout + proc.stderr)[-2000:])
    sys.exit(1)
  per_step = sorted(float(s) for _, s in lines[1:])  # drop compile line
  med = per_step[len(per_step) // 2]
  print("FINAL " + json.dumps({
      "n_iters": n_iters, "log_lines": len(lines),
      "median_s_per_step": round(med, 4),
      "ms_per_step": round(med * 1e3, 1),
      "imgs_per_s": round(batch / med, 1),
      "first_line_s_per_step": round(float(lines[0][1]), 2),
      "final_loss": float(lines[-1][0]),
  }), flush=True)


if __name__ == "__main__":
  main()
