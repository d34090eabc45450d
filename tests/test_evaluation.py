"""FID/IS/KID math tests against scipy/analytic oracles."""
import os

import jax.numpy as jnp
import numpy as np
import scipy.linalg

from score_sde_pytorch_tpu import evaluation


RNG = np.random.default_rng(0)


def _random_psd(d, seed=0):
  rng = np.random.default_rng(seed)
  a = rng.normal(size=(d, d))
  return a @ a.T / d + np.eye(d) * 0.1


def test_sqrtm_matches_scipy():
  a = _random_psd(32)
  got = np.asarray(evaluation.sqrtm_newton_schulz(jnp.asarray(a, jnp.float32)))
  want = scipy.linalg.sqrtm(a).real
  np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)


def test_frechet_distance_identical_is_zero():
  mu = jnp.asarray(RNG.normal(size=(16,)), jnp.float32)
  sigma = jnp.asarray(_random_psd(16), jnp.float32)
  d = float(evaluation.frechet_distance(mu, sigma, mu, sigma))
  assert abs(d) < 1e-2


def test_frechet_distance_matches_scipy_formula():
  mu1 = RNG.normal(size=(8,))
  mu2 = RNG.normal(size=(8,))
  s1 = _random_psd(8, 1)
  s2 = _random_psd(8, 2)
  want = (np.sum((mu1 - mu2) ** 2) + np.trace(s1) + np.trace(s2)
          - 2 * np.trace(scipy.linalg.sqrtm(s1 @ s2).real))
  got = float(evaluation.frechet_distance(
      jnp.asarray(mu1, jnp.float32), jnp.asarray(s1, jnp.float32),
      jnp.asarray(mu2, jnp.float32), jnp.asarray(s2, jnp.float32)))
  np.testing.assert_allclose(got, want, rtol=2e-2)


def test_fid_from_activations_separated_gaussians():
  a1 = RNG.normal(size=(2000, 16))
  a2 = RNG.normal(size=(2000, 16)) + 2.0
  fid_far = evaluation.fid_from_activations(a1, a2)
  a3 = RNG.normal(size=(2000, 16))
  fid_near = evaluation.fid_from_activations(a1, a3)
  # FID ≈ ||Δmu||² = 16*4 = 64 for the far pair, ≈ 0 for the near pair.
  assert fid_far > 50
  assert fid_near < 1.0


def test_inception_score_bounds():
  # Uniform logits → IS = 1 (no information).
  logits = np.zeros((100, 10))
  np.testing.assert_allclose(
      evaluation.inception_score_from_logits(logits), 1.0, rtol=1e-5)
  # One-hot confident logits, uniform marginal → IS = num_classes.
  logits = np.eye(10)[RNG.integers(0, 10, 1000)] * 50.0
  is_val = evaluation.inception_score_from_logits(logits)
  np.testing.assert_allclose(is_val, 10.0, rtol=0.05)


def test_kid_zero_for_same_distribution():
  a1 = RNG.normal(size=(1000, 8))
  a2 = RNG.normal(size=(1000, 8))
  kid_same = evaluation.kid_from_activations(a1, a2, block_size=500)
  a3 = RNG.normal(size=(1000, 8)) + 1.0
  kid_diff = evaluation.kid_from_activations(a1, a3, block_size=500)
  assert abs(kid_same) < 0.05
  assert kid_diff > 10 * max(abs(kid_same), 1e-6)


def test_run_inception_gated_without_weights(monkeypatch):
  monkeypatch.delenv("INCEPTION_WEIGHTS_NPZ", raising=False)
  out = evaluation.run_inception(np.zeros((2, 32, 32, 3), np.uint8))
  assert out is None


def _proto_config(image_size):
  import ml_collections
  c = ml_collections.ConfigDict()
  c.data = ml_collections.ConfigDict({"dataset": "LSUN",
                                      "image_size": image_size})
  c.eval = ml_collections.ConfigDict({"inception_weights": "",
                                      "inception_feature_weights": ""})
  return c


def test_protocol_switch_at_256():
  """reference run_lib.py:257-258: inceptionv3 iff image_size >= 256."""
  assert not evaluation.is_inceptionv3(_proto_config(32))
  assert not evaluation.is_inceptionv3(_proto_config(128))
  assert evaluation.is_inceptionv3(_proto_config(256))
  assert evaluation.is_inceptionv3(_proto_config(1024))
  assert not evaluation.is_inceptionv3(None)


def test_weights_path_selected_by_protocol(tmp_path, monkeypatch):
  fid_npz = tmp_path / "fid.npz"
  fv_npz = tmp_path / "feature_vector.npz"
  fid_npz.write_bytes(b"x")
  fv_npz.write_bytes(b"x")
  monkeypatch.setenv("INCEPTION_WEIGHTS_NPZ", str(fid_npz))
  monkeypatch.setenv("INCEPTION_V3_FEATURE_WEIGHTS_NPZ", str(fv_npz))
  assert evaluation.get_inception_weights_path(
      _proto_config(32)) == str(fid_npz)
  assert evaluation.get_inception_weights_path(
      _proto_config(256)) == str(fv_npz)
  # explicit flag overrides the config-derived protocol
  assert evaluation.get_inception_weights_path(
      _proto_config(32), inceptionv3=True) == str(fv_npz)


def test_is_suppressed_at_256(monkeypatch):
  """reference run_lib.py:389-391: no IS in the >=256px protocol, even when
  logits exist."""
  logits = np.eye(10)[RNG.integers(0, 10, 200)] * 50.0
  pool = RNG.normal(size=(200, 8))
  small = evaluation.compute_scores(pool, _proto_config(32), logits=logits)
  big = evaluation.compute_scores(pool, _proto_config(256), logits=logits)
  assert "inception_score" in small
  assert "inception_score" not in big


def test_compute_dataset_stats_tool_end_to_end(tmp_path, monkeypatch):
  """tools/compute_dataset_stats.py with synthetic data + random Inception
  weights: the produced npz must be loadable by load_dataset_stats and
  usable by compute_scores — the full stats pipeline the reference ships
  pre-baked in assets/stats (reference evaluation.py:43-56), executed in CI
  with the only env-blocked piece (real weights) substituted."""
  import subprocess
  import sys
  from score_sde_pytorch_tpu import inception

  rng = np.random.default_rng(2)
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
  weights = tmp_path / "w.npz"
  np.savez(weights, **raw)

  out_dir = tmp_path / "stats"
  from subproc_env import cpu_child_env
  env = cpu_child_env(INCEPTION_WEIGHTS_NPZ=weights)
  proc = subprocess.run(
      [sys.executable, "tools/compute_dataset_stats.py",
       "--config", "score_sde_pytorch_tpu/configs/ve/cifar10_ncsnpp_continuous.py",
       "--config.data.image_size=16", "--split", "test",
       "--out", str(out_dir), "--max_examples", "8"],
      capture_output=True, text=True, env=env, timeout=900)
  assert proc.returncode == 0, proc.stderr[-2000:]
  stats_file = out_dir / "cifar10_16_stats.npz"
  assert stats_file.exists()

  import ml_collections
  cfg = ml_collections.ConfigDict()
  cfg.data = ml_collections.ConfigDict({"dataset": "CIFAR10",
                                        "image_size": 16})
  cfg.eval = ml_collections.ConfigDict({})
  monkeypatch.chdir(tmp_path)  # load_dataset_stats looks under assets/stats
  os.makedirs("assets", exist_ok=True)
  os.symlink(out_dir, "assets/stats")
  loaded = evaluation.load_dataset_stats(cfg)
  assert loaded["mu"].shape == (2048,)
  assert loaded["sigma"].shape == (2048, 2048)
  pool = rng.normal(size=(64, 2048)).astype(np.float32)
  scores = evaluation.compute_scores(pool, cfg)
  assert "fid" in scores and np.isfinite(scores["fid"])
