"""Inception-V3 feature extractor architecture tests (weight-free)."""
import jax.numpy as jnp
import numpy as np

from score_sde_pytorch_tpu import inception


def test_forward_shapes_random_weights():
  p = inception.random_params(0)
  x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 299, 299, 3)),
                  jnp.float32)
  pool, logits = inception._forward(p, x)
  assert pool.shape == (2, 2048)
  assert logits.shape == (2, 1008)
  assert np.isfinite(np.asarray(pool)).all()


def test_weight_spec_consistency():
  spec = inception.weight_spec()
  names = [s[0] for s in spec]
  assert len(names) == len(set(names))
  assert len(spec) == 94  # 5 stem + 89 block convs


def test_avg_pool_no_include_pad():
  """Border cells divide by the true window size (4 at corners)."""
  x = jnp.ones((1, 4, 4, 1))
  out = inception._avg_pool_3x3_noinc(x)
  np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_fold_bn():
  params = {
      "x.bn.weight": np.array([2.0]), "x.bn.bias": np.array([1.0]),
      "x.bn.running_mean": np.array([0.5]),
      "x.bn.running_var": np.array([4.0]),
  }
  scale, shift = inception._fold_bn(params, "x")
  v = 3.0 * scale[0] + shift[0]
  want = (3.0 - 0.5) / np.sqrt(4.0 + 1e-3) * 2.0 + 1.0
  np.testing.assert_allclose(v, want, rtol=1e-6)


def test_load_params_roundtrip(tmp_path):
  # load_params validates the FULL schema (a partial npz now raises — see
  # tests/test_inception_oracle.py), so build a complete state dict.
  rng = np.random.default_rng(0)
  raw = {}
  for name, kh, kw, cin, cout in inception.weight_spec():
    raw[f"{name}.conv.weight"] = rng.normal(
        size=(cout, cin, kh, kw)).astype(np.float32)
    raw[f"{name}.bn.weight"] = np.ones(cout, np.float32)
    raw[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
    raw[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
    raw[f"{name}.bn.running_var"] = np.ones(cout, np.float32)
  raw["fc.weight"] = rng.normal(size=(1008, 2048)).astype(np.float32)
  raw["fc.bias"] = np.zeros(1008, np.float32)
  path = tmp_path / "w.npz"
  np.savez(path, **raw)
  p = inception.load_params(str(path))
  assert p["Conv2d_1a_3x3.conv.weight"].shape == (3, 3, 3, 32)
  assert p["fc.weight"].shape == (2048, 1008)
  assert "Conv2d_1a_3x3.scale" in p


def test_features_class_with_random_weights_sharded(tmp_path):
  """End-to-end InceptionV3Features on the 8-device CPU mesh."""
  import jax
  import numpy as np
  from score_sde_pytorch_tpu import inception

  # Serialize random params to an npz in the loadable (torch-layout) format.
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
  path = tmp_path / "w.npz"
  np.savez(path, **raw)

  model = inception.InceptionV3Features(str(path), batch=8)
  imgs = rng.integers(0, 256, (10, 32, 32, 3), dtype=np.int64).astype(np.uint8)
  out = model(imgs)
  assert out["pool_3"].shape == (10, 2048)
  assert out["logits"].shape == (10, 1008)
  assert np.isfinite(out["pool_3"]).all()


def test_convert_inception_weights_tool_end_to_end(tmp_path):
  """Feed tools/convert_inception_weights.py a synthetic torch state_dict
  with the exact pytorch-fid key schema (incl. num_batches_tracked), run
  the real converter, then load_params -> InceptionV3Features — pinning
  key-schema compatibility of the whole weight path (VERDICT r2 #10)."""
  import subprocess
  import sys
  import torch

  rng = np.random.default_rng(1)
  sd = {}
  for name, kh, kw, cin, cout in inception.weight_spec():
    sd[f"{name}.conv.weight"] = torch.from_numpy(rng.normal(
        0, 1 / np.sqrt(kh * kw * cin), (cout, cin, kh, kw)).astype(np.float32))
    sd[f"{name}.bn.weight"] = torch.ones(cout)
    sd[f"{name}.bn.bias"] = torch.zeros(cout)
    sd[f"{name}.bn.running_mean"] = torch.zeros(cout)
    sd[f"{name}.bn.running_var"] = torch.ones(cout)
    sd[f"{name}.bn.num_batches_tracked"] = torch.tensor(0)
  sd["fc.weight"] = torch.from_numpy(
      rng.normal(0, 0.02, (1008, 2048)).astype(np.float32))
  sd["fc.bias"] = torch.zeros(1008)

  src = tmp_path / "pt_inception-synth.pth"
  dst = tmp_path / "converted.npz"
  torch.save(sd, src)
  from subproc_env import cpu_child_env
  proc = subprocess.run(
      [sys.executable, "tools/convert_inception_weights.py",
       str(src), str(dst)],
      capture_output=True, text=True, env=cpu_child_env())
  assert proc.returncode == 0, proc.stderr
  assert dst.exists()

  # num_batches_tracked must have been dropped, all tensors converted.
  with np.load(dst) as z:
    assert not any(k.endswith("num_batches_tracked") for k in z.files)

  model = inception.InceptionV3Features(str(dst), batch=4, shard=False)
  imgs = rng.integers(0, 256, (3, 16, 16, 3), dtype=np.int64).astype(np.uint8)
  out = model(imgs)
  assert out["pool_3"].shape == (3, 2048)
  assert out["logits"].shape == (3, 1008)
  assert np.isfinite(out["pool_3"]).all()
