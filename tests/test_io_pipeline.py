"""GCS-transparent I/O: the full train+eval pipelines against a non-local
``myfs://`` workdir via a registered scheme handler (VERDICT r1 item #4;
reference routes everything through tf.io.gfile — run_lib.py:58-75,
utils.py:7-29, main.py:43).
"""
import glob
import os

import numpy as np
import pytest

from score_sde_pytorch_tpu.utils import io as io_utils

pytestmark = pytest.mark.slow  # full train+eval pipelines: minutes of jit


@pytest.fixture
def myfs(tmp_path):
  root = tmp_path / "bucket_root"
  root.mkdir()
  io_utils.register_scheme("myfs", io_utils.LocalMirrorHandler("myfs",
                                                               str(root)))
  yield str(root)
  io_utils.unregister_scheme("myfs")


def test_io_helpers_on_scheme_paths(myfs):
  io_utils.makedirs("myfs://bucket/a/b")
  assert io_utils.exists("myfs://bucket/a/b")
  assert os.path.isdir(os.path.join(myfs, "bucket/a/b"))
  io_utils.save_npz("myfs://bucket/a/x.npz", v=np.arange(3))
  assert io_utils.load_npz("myfs://bucket/a/x.npz")["v"].tolist() == [0, 1, 2]
  io_utils.save_npy("myfs://bucket/a/y.np", np.ones(2))
  assert io_utils.exists("myfs://bucket/a/y.np.npy")
  assert sorted(io_utils.listdir("myfs://bucket/a")) == ["b", "x.npz",
                                                         "y.np.npy"]


def test_unregistered_scheme_uses_gfile_handler():
  h = io_utils._handler("gs://bucket/x")
  assert isinstance(h, io_utils.GFileHandler)
  assert io_utils.localize("gs://bucket/x") == "gs://bucket/x"
  assert io_utils._handler("/local/path") is None


def test_train_and_eval_on_scheme_workdir(myfs):
  """Every artifact write in the pipelines must survive a scheme workdir
  (r1 crashed at the first os.makedirs)."""
  from score_sde_pytorch_tpu import run_lib
  from tests.test_run_lib import _pipeline_config

  cfg = _pipeline_config()
  cfg.training.n_iters = 5
  cfg.training.snapshot_freq = 4
  workdir = "myfs://bucket/wd"
  run_lib.train(cfg, workdir)

  local_wd = os.path.join(myfs, "bucket/wd")
  assert os.path.isdir(os.path.join(local_wd, "checkpoints", "checkpoint_1"))
  assert os.path.isdir(os.path.join(local_wd, "checkpoints-meta",
                                    "checkpoint"))
  pngs = glob.glob(os.path.join(local_wd, "samples", "iter_*", "sample.png"))
  assert pngs, "no sample grid written through the scheme"
  npys = glob.glob(os.path.join(local_wd, "samples", "iter_*",
                                "sample.np.npy"))
  assert npys

  run_lib.evaluate(cfg, workdir, "eval")
  loss_npz = os.path.join(local_wd, "eval", "ckpt_1_loss.npz")
  assert os.path.exists(loss_npz)
  with np.load(loss_npz) as z:
    assert np.isfinite(z["mean_loss"])


def test_cli_main_on_scheme_workdir(myfs):
  """main.py logging + workdir creation through the scheme handler
  (reference main.py:43 logs via gfile so gs:// workdirs work)."""
  import logging
  from score_sde_pytorch_tpu import main as main_mod

  cfg_path = ("score_sde_pytorch_tpu/configs/ve/"
              "cifar10_ncsnpp_continuous.py")
  argv = ["prog", f"--config={cfg_path}", "--workdir=myfs://bucket/cli_wd",
          "--mode=train"]
  main_mod.FLAGS.unparse_flags()
  main_mod.FLAGS(argv)
  cfg = main_mod.FLAGS.config
  cfg.training.update({"n_iters": 1, "batch_size": 8, "snapshot_freq": 4,
                       "snapshot_freq_for_preemption": 2, "eval_freq": 3,
                       "log_freq": 1, "snapshot_sampling": False})
  cfg.model.update({"nf": 8, "ch_mult": (1, 2), "num_res_blocks": 1,
                    "attn_resolutions": (8,), "num_scales": 8})
  cfg.data.image_size = 16
  root = logging.getLogger()
  handlers_before = list(root.handlers)
  try:
    main_mod.main([])
  finally:
    for h in list(root.handlers):
      if h not in handlers_before:
        root.removeHandler(h)
        h.close()
  log = os.path.join(myfs, "bucket/cli_wd", "stdout.txt")
  assert os.path.exists(log)
  with open(log) as f:
    assert "training_loss" in f.read()
