"""End-to-end pipeline smoke tests (SURVEY.md §4(e)): tiny config, few
steps, synthetic data — train → checkpoint → resume → sample grid."""
import glob
import os

import numpy as np
import pytest

from tests.test_models import tiny_config

pytestmark = pytest.mark.slow  # full train->resume->eval pipelines


def _pipeline_config():
  import ml_collections
  cfg = tiny_config()
  cfg.training.update({
      "batch_size": 8, "n_iters": 6, "snapshot_freq": 4, "log_freq": 2,
      "eval_freq": 3, "snapshot_freq_for_preemption": 3,
      "snapshot_sampling": True, "likelihood_weighting": False,
      "continuous": True, "reduce_mean": False, "n_jitted_steps": 1,
      "sde": "vesde"})
  cfg.sampling = ml_collections.ConfigDict({
      "method": "pc", "predictor": "reverse_diffusion",
      "corrector": "none", "snr": 0.16, "n_steps_each": 1,
      "probability_flow": False, "noise_removal": True})
  cfg.eval = ml_collections.ConfigDict({
      "begin_ckpt": 1, "end_ckpt": 1, "batch_size": 8,
      "enable_sampling": False, "num_samples": 8, "enable_loss": True,
      "enable_bpd": False, "bpd_dataset": "test"})
  cfg.data.update({"random_flip": True, "uniform_dequantization": False,
                   "dataset": "CIFAR10", "data_dir": ""})
  cfg.optim = ml_collections.ConfigDict({
      "weight_decay": 0, "optimizer": "Adam", "lr": 1e-3, "beta1": 0.9,
      "eps": 1e-8, "warmup": 2, "grad_clip": 1.0})
  cfg.seed = 42
  cfg.mesh = ml_collections.ConfigDict({"data_axis": -1})
  cfg.model.num_scales = 8  # fast sampling in snapshots
  return cfg


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
  return str(tmp_path_factory.mktemp("train_smoke"))


def test_train_pipeline_end_to_end(workdir):
  from score_sde_pytorch_tpu import run_lib
  cfg = _pipeline_config()
  run_lib.train(cfg, workdir)
  # Numbered checkpoint written at step 4 (4 // 4 = 1).
  assert os.path.exists(os.path.join(workdir, "checkpoints", "checkpoint_1"))
  # Meta checkpoint written (preemption tier).
  assert os.path.exists(os.path.join(workdir, "checkpoints-meta",
                                     "checkpoint"))
  # Sample snapshot saved.
  pngs = glob.glob(os.path.join(workdir, "samples", "iter_*", "sample.png"))
  assert pngs, "no snapshot sample grid written"


def test_train_trace_window_writes_profile(tmp_path):
  """training.trace_steps captures a windowed profiler trace; the stop
  is preceded by a device sync so the window contains the dispatched
  steps (pipelined loop does not sync per-iteration otherwise)."""
  from score_sde_pytorch_tpu import run_lib
  cfg = _pipeline_config()
  cfg.training.trace_steps = 2
  cfg.training.snapshot_sampling = False
  wd = str(tmp_path / "wd")
  run_lib.train(cfg, wd)
  prof_files = glob.glob(os.path.join(wd, "profile", "**", "*"),
                         recursive=True)
  assert any(os.path.isfile(p) for p in prof_files), prof_files


def test_evaluate_raises_on_nonfinite_samples(tmp_path, monkeypatch):
  """The ODE sampler returns all-NaN on non-convergence (ode.py failure
  contract); evaluate() must refuse to launder that into black uint8
  images and a finite FID."""
  import jax.numpy as jnp
  import pytest as _pytest
  from score_sde_pytorch_tpu import run_lib, sampling

  workdir = str(tmp_path / "wd")
  cfg = _pipeline_config()
  cfg.training.n_iters = 5
  cfg.training.snapshot_freq = 4
  cfg.training.snapshot_sampling = False
  cfg.eval.update({"enable_loss": False, "enable_bpd": False,
                   "enable_sampling": True, "num_samples": 8,
                   "begin_ckpt": 1, "end_ckpt": 1})
  run_lib.train(cfg, workdir)

  def nan_sampling_fn(config, sde, model_def, shape, inverse_scaler,
                      eps=None, mesh=None):
    return lambda rng, params: (jnp.full(shape, jnp.nan), 0)

  monkeypatch.setattr(sampling, "get_sampling_fn", nan_sampling_fn)
  with _pytest.raises(RuntimeError, match="non-finite samples"):
    run_lib.evaluate(cfg, workdir, "eval")


def test_train_resumes_from_meta(workdir):
  """Re-running train with a higher n_iters resumes from the rolling meta
  checkpoint instead of restarting at 0."""
  from score_sde_pytorch_tpu import run_lib
  from score_sde_pytorch_tpu import checkpoint as ckpt_lib
  from score_sde_pytorch_tpu import losses
  import jax

  cfg = _pipeline_config()
  cfg.training.n_iters = 8
  run_lib.train(cfg, workdir)
  _, fresh = losses.init_train_state(cfg, jax.random.PRNGKey(0))
  mgr = ckpt_lib.CheckpointManager(workdir)
  state = mgr.restore_meta(fresh)
  assert int(state.step) >= 6  # continued past first run's end


def test_evaluate_pipeline_loss_stage(workdir):
  from score_sde_pytorch_tpu import run_lib
  cfg = _pipeline_config()
  run_lib.evaluate(cfg, workdir, "eval")
  out = glob.glob(os.path.join(workdir, "eval", "ckpt_1_loss.npz"))
  assert out
  with np.load(out[0]) as z:
    assert np.isfinite(z["mean_loss"])


def test_evaluate_sampling_stage_with_fake_inception(tmp_path, monkeypatch):
  """Full eval sampling stage: sample → Inception features → FID/IS/KID
  report, using random Inception weights and self-derived dataset stats."""
  import jax
  import numpy as np
  from score_sde_pytorch_tpu import inception, run_lib

  # Random (but architecture-correct) Inception weights npz.
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

  # Dataset stats from random features (cifar10_16 to match tiny config).
  stats_dir = tmp_path / "assets" / "stats"
  stats_dir.mkdir(parents=True)
  feats = rng.normal(size=(256, 2048)).astype(np.float32)
  np.savez(stats_dir / "cifar10_16_stats.npz",
           mu=feats.mean(0), sigma=np.cov(feats, rowvar=False))
  monkeypatch.chdir(tmp_path)

  workdir = str(tmp_path / "wd")
  cfg = _pipeline_config()
  cfg.training.n_iters = 5
  cfg.training.snapshot_freq = 4
  cfg.training.snapshot_sampling = False
  # Sample with the stochastic fast sampler — covers the dpmpp_stochastic
  # config path e2e (PC is covered by the train snapshot pipeline test).
  cfg.sampling.update({"method": "dpmpp", "dpmpp_steps": 4,
                       "dpmpp_stochastic": True})
  cfg.eval.update({"enable_loss": False, "enable_bpd": False,
                   "enable_sampling": True, "num_samples": 8,
                   "begin_ckpt": 1, "end_ckpt": 1})
  run_lib.train(cfg, workdir)
  run_lib.evaluate(cfg, workdir, "eval")

  import glob as globmod
  report = globmod.glob(os.path.join(workdir, "eval", "report_1.npz"))
  assert report, "no FID report written"
  with np.load(report[0]) as z:
    keys = set(z.keys())
    assert "inception_score" in keys
    assert "fid" in keys
    assert np.isfinite(z["fid"])


def test_sample_mode_from_trained_workdir(workdir):
  """--mode sample: restore the latest numbered checkpoint and write PNG
  grids + uint8 npz without touching dataset/Inception/stats (the
  reference-notebook generation workflow as a first-class mode)."""
  from score_sde_pytorch_tpu import run_lib
  cfg = _pipeline_config()
  run_lib.sample(cfg, workdir, "generated", checkpoint=-1, num_samples=12)
  outs = sorted(glob.glob(os.path.join(workdir, "generated",
                                       "samples_*.npz")))
  assert len(outs) == 2  # 12 samples at batch 8 -> 2 rounds
  with np.load(outs[0]) as z:
    s = z["samples"]
    assert s.dtype == np.uint8
    assert s.shape == (8, cfg.data.image_size, cfg.data.image_size, 3)
  with np.load(outs[1]) as z:
    # final round trimmed to exactly --num_samples total (ADVICE r4:
    # 12 at batch 8 used to write 16)
    assert z["samples"].shape[0] == 4
  pngs = glob.glob(os.path.join(workdir, "generated", "samples_*.png"))
  assert len(pngs) == 2


def test_bounded_drain_caps_unfetched_results():
  """The eval/bpd loops must never hold more than MAX_INFLIGHT un-fetched
  device results (VERDICT r4 #4): _bounded_drain pops+fetches the oldest
  exactly when the queue exceeds the bound, in FIFO order."""
  import collections
  from score_sde_pytorch_tpu import run_lib

  fetched = []
  inflight = collections.deque()
  out = []
  for i in range(10):
    inflight.append(i)
    done = run_lib._bounded_drain(inflight, lambda x: fetched.append(x) or x)
    if done is not None:
      out.append(done)
    assert len(inflight) <= run_lib.MAX_INFLIGHT
  out.extend(inflight)
  assert out == list(range(10))  # FIFO, nothing dropped
  assert fetched == list(range(10 - run_lib.MAX_INFLIGHT))


def test_sample_mode_requires_a_checkpoint(tmp_path):
  from score_sde_pytorch_tpu import run_lib
  cfg = _pipeline_config()
  with pytest.raises(FileNotFoundError, match="no checkpoint"):
    run_lib.sample(cfg, str(tmp_path / "empty_wd"))


def test_evaluate_pipeline_bpd_stage_with_stub_likelihood(tmp_path,
                                                          monkeypatch):
  """The bpd eval stage end-to-end through run_lib.evaluate — bounded
  dispatch queue, per-batch gather, 5x test-set repeats, npz artifact —
  with a cheap stub likelihood (the likelihood math itself is pinned by
  tests/test_likelihood.py; this test pins the LOOP, which previously had
  no coverage and was rewritten for VERDICT r4 #4). Self-contained: trains
  its own checkpoint_1 (evaluate() polls forever without one)."""
  import jax
  import jax.numpy as jnp
  from score_sde_pytorch_tpu import likelihood as likelihood_lib
  from score_sde_pytorch_tpu import run_lib

  workdir = str(tmp_path / "wd")
  cfg = _pipeline_config()
  cfg.training.n_iters = 5
  cfg.training.snapshot_freq = 4
  cfg.training.snapshot_sampling = False
  run_lib.train(cfg, workdir)

  calls = []

  def stub_get_likelihood_fn(sde, model_def, inverse_scaler, mesh=None):
    def likelihood_fn(rng, params, batch):
      calls.append(batch.shape)
      bpd = jnp.full((batch.shape[0],), 3.25)
      return bpd, jnp.zeros_like(batch), jnp.asarray(10)
    return likelihood_fn

  monkeypatch.setattr(likelihood_lib, "get_likelihood_fn",
                      stub_get_likelihood_fn)
  cfg.eval.update({"enable_loss": False, "enable_bpd": True,
                   "bpd_dataset": "test"})
  run_lib.evaluate(cfg, workdir, "eval_bpd")
  out = os.path.join(workdir, "eval_bpd", "test_ckpt_1_bpd.npz")
  assert os.path.exists(out)
  with np.load(out) as z:
    bpds = z["bpd"]
  # synthetic test split: 128 examples, batch 8 -> 16 batches/epoch,
  # repeated 5x for the test split (reference run_lib.py:236-242)
  assert len(calls) == 16 * 5
  assert bpds.shape == (16 * 5 * 8,)
  np.testing.assert_allclose(bpds, 3.25)
