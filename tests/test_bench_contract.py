"""bench.py output contract: the driver records ONLY the printed JSON line.

BENCH_r04 was empty (rc=124, no JSON) because the round-4 bench printed its
line last with no overall budget — a slow stage starved the artifact. These
tests pin the driver-proofing: the line must appear and parse even when the
budget expires mid-stage (watchdog path), and a normal CPU run must emit the
full contract keys.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(budget_s, timeout_s):
  from subproc_env import cpu_child_env
  env = cpu_child_env(BENCH_BUDGET_S=budget_s)
  proc = subprocess.run(
      [sys.executable, os.path.join(REPO, "bench.py")], cwd=REPO, env=env,
      capture_output=True, text=True, timeout=timeout_s)
  lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
  assert lines, f"no JSON line printed; stderr tail: {proc.stderr[-500:]}"
  return proc.returncode, json.loads(lines[-1])


@pytest.mark.slow
def test_watchdog_emits_parseable_json_under_tiny_budget():
  """Budget far below one compile: the watchdog must still print the full
  one-line contract (value None, budget_exceeded recorded) and exit 0."""
  rc, out = _run_bench(budget_s=15, timeout_s=180)
  assert rc == 0
  for key in ("metric", "value", "unit", "vs_baseline", "extra"):
    assert key in out
  assert "budget_exceeded" in out["extra"]
  assert out["extra"]["bench_wall_s"] < 60


def test_reporter_emits_once_and_skips_stages():
  """Unit-level: the reporter prints exactly once, and stage gating records
  skipped rows instead of silently dropping them."""
  sys.path.insert(0, REPO)
  import bench

  rep = bench._Reporter(budget_s=0.0)  # everything after now is over budget
  rep.extra["platform"] = "test"
  rep.set_headline(3.5)
  import io
  from contextlib import redirect_stdout
  buf = io.StringIO()
  with redirect_stdout(buf):
    rep.emit()
    rep.emit()  # second call must be a no-op
  lines = [l for l in buf.getvalue().splitlines() if l.strip()]
  assert len(lines) == 1
  out = json.loads(lines[0])
  assert out["value"] == 3.5
  assert out["vs_baseline"] == round(3.5 / bench.BASELINE_SAMPLES_PER_SEC_PER_CHIP, 3)
  assert rep.remaining() <= 0
