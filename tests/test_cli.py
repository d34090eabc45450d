"""End-to-end CLI test: the reference's exact invocation surface
(main.py --config --workdir --mode, CLI config overrides)."""
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess CLI runs with fresh jit compiles


@pytest.mark.parametrize("mode", ["train"])
def test_cli_train_tiny(tmp_path, mode):
  workdir = str(tmp_path / "wd")
  cmd = [
      sys.executable, "-m", "score_sde_pytorch_tpu.main",
      "--config",
      "score_sde_pytorch_tpu/configs/vp/cifar10_ddpmpp_continuous.py",
      "--workdir", workdir,
      "--mode", mode,
      "--platform", "cpu",
      # tiny overrides so this runs in seconds on CPU
      "--config.training.n_iters=2",
      "--config.training.batch_size=8",
      "--config.training.snapshot_freq=2",
      "--config.training.snapshot_freq_for_preemption=2",
      "--config.training.eval_freq=10",
      "--config.training.log_freq=1",
      "--config.training.snapshot_sampling=False",
      "--config.model.nf=8",
      "--config.model.ch_mult=(1,2)",
      "--config.model.num_res_blocks=1",
      "--config.model.attn_resolutions=(8,)",
      "--config.model.num_scales=8",
      "--config.data.image_size=16",
  ]
  from subproc_env import cpu_child_env
  env = cpu_child_env()
  result = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                          cwd="/root/repo", env=env)
  assert result.returncode == 0, result.stderr[-3000:]
  # stdout.txt logging side-effect (reference main.py:40-49)
  assert os.path.exists(os.path.join(workdir, "stdout.txt"))
  log = open(os.path.join(workdir, "stdout.txt")).read()
  assert "training_loss" in log
  assert os.path.exists(os.path.join(workdir, "checkpoints-meta",
                                     "checkpoint"))


def test_cli_compilation_cache_flag(tmp_path):
  """--compilation_cache_dir persists XLA executables across runs: the
  cache dir must be non-empty after a tiny train (on the axon relay a
  first jit costs minutes — this flag pays it once per program)."""
  workdir = str(tmp_path / "wd")
  cache = str(tmp_path / "xla_cache")
  cmd = [
      sys.executable, "-m", "score_sde_pytorch_tpu.main",
      "--config",
      "score_sde_pytorch_tpu/configs/vp/cifar10_ddpmpp_continuous.py",
      "--workdir", workdir,
      "--mode", "train",
      "--platform", "cpu",
      "--compilation_cache_dir", cache,
      "--config.training.n_iters=1",
      "--config.training.batch_size=4",
      "--config.training.snapshot_freq=2",
      "--config.training.snapshot_freq_for_preemption=2",
      "--config.training.eval_freq=10",
      "--config.training.log_freq=1",
      "--config.training.snapshot_sampling=False",
      "--config.model.nf=8",
      "--config.model.ch_mult=(1,2)",
      "--config.model.num_res_blocks=1",
      "--config.model.attn_resolutions=(8,)",
      "--config.model.num_scales=8",
      "--config.data.image_size=16",
  ]
  # Pin the subprocess to ONE cpu device: conftest exports
  # --xla_force_host_platform_device_count=8 into os.environ, which the child
  # would inherit and then (correctly) reject batch_size=4 as not divisible
  # by 8 (run_lib device-count check).
  from subproc_env import cpu_child_env
  env = cpu_child_env()
  env["XLA_FLAGS"] = " ".join(
      f for f in env.get("XLA_FLAGS", "").split()
      if "xla_force_host_platform_device_count" not in f)
  result = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                          cwd="/root/repo", env=env)
  assert result.returncode == 0, result.stderr[-3000:]
  assert os.path.isdir(cache) and os.listdir(cache), (
      "compilation cache dir is empty — executables were not persisted")
