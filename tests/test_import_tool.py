"""tools/import_reference_checkpoint.py: reference .pth → Orbax workdir
(VERDICT r3 #4 — "one command produces a report from a reference-format
checkpoint"; interop.py had the math, this pins the CLI path around it).
"""
import os
import sys

import jax
import numpy as np
import pytest

import score_sde_pytorch_tpu.models  # noqa: F401
from score_sde_pytorch_tpu import checkpoint as ckpt_lib
from score_sde_pytorch_tpu import interop, losses
from tests.test_models import tiny_config
from tests.test_run_lib import _pipeline_config

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _flat_equal(a, b):
  fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
  assert len(fa) == len(fb)
  for x, y in zip(fa, fb):
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_import_roundtrips_params_and_ema(tmp_path):
  """Export a (fourier NCSN++) state as a reference .pth, import it back
  through the tool, and check the Orbax checkpoint restores the same model
  AND EMA params with the original step."""
  torch = pytest.importorskip("torch")
  from import_reference_checkpoint import import_checkpoint

  import ml_collections
  cfg = tiny_config()  # fourier embedding: the EMA-misalignment regression
  cfg.optim = ml_collections.ConfigDict({
      "weight_decay": 0, "optimizer": "Adam", "lr": 1e-3, "beta1": 0.9,
      "eps": 1e-8, "warmup": 0, "grad_clip": 1.0})
  cfg.seed = 0
  _, state = losses.init_train_state(cfg, jax.random.PRNGKey(3))
  params = jax.tree.map(np.asarray, state.params)
  # Make EMA visibly different from params so the test can tell them apart.
  ema_params = jax.tree.map(lambda x: x * 0.5 + 0.01, params)

  pth = str(tmp_path / "ref.pth")
  interop.export_torch_checkpoint(params, cfg, pth, step=12)
  # splice distinct EMA shadows into the exported file (reference schema)
  ckpt = torch.load(pth, map_location="cpu", weights_only=False)
  rows = interop._param_rows(cfg)
  shadow_keys = ["module." + tk for tk, fp, _ in rows
                 if fp not in interop._NON_TRAINABLE_FLAX_PATHS]
  sd_ema = interop.flax_params_to_torch_state_dict(ema_params, cfg,
                                                   module_prefix=True)
  ckpt["ema"]["shadow_params"] = [
      torch.from_numpy(np.ascontiguousarray(sd_ema[k]).copy())
      for k in shadow_keys]
  torch.save(ckpt, pth)

  workdir = str(tmp_path / "wd")
  cfg.training.snapshot_freq = 4
  number = import_checkpoint(cfg, pth, workdir)
  assert number == 3  # step 12 // snapshot_freq 4

  _, template = losses.init_train_state(cfg, jax.random.PRNGKey(0))
  mgr = ckpt_lib.CheckpointManager(workdir)
  restored = mgr.restore_numbered(template, number)
  assert int(restored.step) == 12
  assert int(restored.ema.num_updates) == 12
  _flat_equal(restored.params, params)
  # EMA came from shadow_params — except the non-trainable fourier W, which
  # the reference EMA never tracks and the import takes from the model.
  got_ema = jax.tree.map(np.asarray, restored.ema.params)
  np.testing.assert_allclose(got_ema["FourierProj"]["W"],
                             params["FourierProj"]["W"], rtol=1e-6)
  want_ema = dict(ema_params)
  got_flat = {k: v for k, v in got_ema.items() if k != "FourierProj"}
  want_flat = {k: v for k, v in want_ema.items() if k != "FourierProj"}
  _flat_equal(got_flat, want_flat)


@pytest.mark.slow
def test_imported_checkpoint_drives_evaluate(tmp_path, monkeypatch):
  """End-to-end: import a reference-format checkpoint, run the REAL
  run_lib.evaluate() on it with synthetic Inception weights + stats, and get
  a report_N.npz with finite FID — the full reference eval protocol
  (reference run_lib.py:330-408) on reference weights."""
  pytest.importorskip("torch")
  from import_reference_checkpoint import import_checkpoint
  from score_sde_pytorch_tpu import inception, run_lib

  cfg = _pipeline_config()
  cfg.sampling.update({"method": "pc"})
  cfg.eval.update({"enable_loss": True, "enable_sampling": True,
                   "num_samples": 8, "begin_ckpt": 2, "end_ckpt": 2})

  _, state = losses.init_train_state(cfg, jax.random.PRNGKey(1))
  params = jax.tree.map(np.asarray, state.params)
  pth = str(tmp_path / "ref.pth")
  interop.export_torch_checkpoint(params, cfg, pth, step=8)

  workdir = str(tmp_path / "wd")
  number = import_checkpoint(cfg, pth, workdir)
  assert number == 2  # step 8 // snapshot_freq 4

  # Synthetic-but-architecture-correct Inception weights + dataset stats
  # (the zero-egress substitute; the real files drop in via the same envs).
  rng = np.random.default_rng(0)
  raw = {}
  for name, kh, kw, cin, cout in inception.weight_spec():
    raw[f"{name}.conv.weight"] = rng.normal(
        0, 1 / np.sqrt(kh * kw * cin), (cout, cin, kh, kw)).astype(np.float32)
    raw[f"{name}.bn.weight"] = np.ones(cout, np.float32)
    raw[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
    raw[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
    raw[f"{name}.bn.running_var"] = np.ones(cout, np.float32)
  raw["fc.weight"] = rng.normal(0, 0.02, (1008, 2048)).astype(np.float32)
  raw["fc.bias"] = np.zeros(1008, np.float32)
  wpath = tmp_path / "incep.npz"
  np.savez(wpath, **raw)
  monkeypatch.setenv("INCEPTION_WEIGHTS_NPZ", str(wpath))
  stats_dir = tmp_path / "assets" / "stats"
  stats_dir.mkdir(parents=True)
  feats = rng.normal(size=(256, 2048)).astype(np.float32)
  np.savez(stats_dir / "cifar10_16_stats.npz",
           mu=feats.mean(0), sigma=np.cov(feats, rowvar=False))
  monkeypatch.chdir(tmp_path)

  run_lib.evaluate(cfg, workdir, "eval")
  eval_dir = os.path.join(workdir, "eval")
  with np.load(os.path.join(eval_dir, "ckpt_2_loss.npz")) as z:
    assert np.isfinite(z["mean_loss"])
  with np.load(os.path.join(eval_dir, "report_2.npz")) as z:
    assert np.isfinite(z["fid"])


@pytest.mark.slow
def test_imported_checkpoint_drives_sample_mode(tmp_path):
  """The MIGRATION.md two-command claim: reference .pth →
  tools/import_reference_checkpoint.py → `--mode sample` produces images,
  no dataset/Inception/stats anywhere."""
  pytest.importorskip("torch")
  from import_reference_checkpoint import import_checkpoint
  from score_sde_pytorch_tpu import run_lib

  cfg = _pipeline_config()
  cfg.sampling.update({"method": "pc"})

  _, state = losses.init_train_state(cfg, jax.random.PRNGKey(2))
  params = jax.tree.map(np.asarray, state.params)
  pth = str(tmp_path / "ref.pth")
  interop.export_torch_checkpoint(params, cfg, pth, step=8)

  workdir = str(tmp_path / "wd")
  number = import_checkpoint(cfg, pth, workdir)

  run_lib.sample(cfg, workdir, "generated", checkpoint=number,
                 num_samples=8)
  out = os.path.join(workdir, "generated")
  with np.load(os.path.join(out, "samples_0.npz")) as z:
    s = z["samples"]
    assert s.dtype == np.uint8 and s.shape[0] == 8
    assert np.isfinite(s).all()
  assert os.path.exists(os.path.join(out, "samples_0.png"))
