"""Data pipeline tests."""
import os
import pickle

import ml_collections
import numpy as np
import pytest

from score_sde_pytorch_tpu import datasets


def _config(tmp_path=None, dataset="CIFAR10", centered=False, flip=True,
            dequant=False, batch=8, size=32):
  c = ml_collections.ConfigDict()
  c.training = ml_collections.ConfigDict({"batch_size": batch})
  c.eval = ml_collections.ConfigDict({"batch_size": batch})
  c.data = ml_collections.ConfigDict({
      "dataset": dataset, "image_size": size, "num_channels": 3,
      "random_flip": flip, "centered": centered,
      "uniform_dequantization": dequant,
      "data_dir": str(tmp_path) if tmp_path else ""})
  c.seed = 0
  return c


def test_scalers_roundtrip():
  cfg = _config(centered=True)
  s = datasets.get_data_scaler(cfg)
  inv = datasets.get_data_inverse_scaler(cfg)
  x = np.linspace(0, 1, 11)
  np.testing.assert_allclose(inv(s(x)), x, atol=1e-7)
  np.testing.assert_allclose(s(np.array([0.0, 1.0])), [-1.0, 1.0])


def test_synthetic_iterator_shapes_and_range():
  cfg = _config()
  train_it, eval_it = datasets.get_dataset(cfg)
  b = next(train_it)
  assert b.shape == (8, 32, 32, 3)
  assert b.dtype == np.float32
  assert 0.0 <= b.min() and b.max() <= 1.0
  b2 = next(eval_it)
  assert b2.shape == (8, 32, 32, 3)


def test_uniform_dequantization_breaks_discreteness():
  cfg = _config(dequant=True)
  train_it, _ = datasets.get_dataset(cfg)
  b = next(train_it)
  # (u + 255x)/256 never exactly hits k/255 grid values
  frac = (b * 256.0) % 1.0
  assert not np.allclose(frac, 0.0)
  assert b.max() <= 1.0 and b.min() >= 0.0


def test_cifar10_pickle_loader(tmp_path):
  base = tmp_path / "cifar-10-batches-py"
  base.mkdir()
  rng = np.random.default_rng(0)
  for i in range(1, 6):
    data = rng.integers(0, 256, size=(20, 3072), dtype=np.int64)
    with open(base / f"data_batch_{i}", "wb") as f:
      pickle.dump({b"data": data.astype(np.uint8),
                   b"labels": [0] * 20}, f)
  with open(base / "test_batch", "wb") as f:
    pickle.dump({b"data": rng.integers(0, 256, (10, 3072)).astype(np.uint8),
                 b"labels": [0] * 10}, f)
  cfg = _config(tmp_path=tmp_path, batch=4)
  train_it, eval_it = datasets.get_dataset(cfg)
  b = next(train_it)
  assert b.shape == (4, 32, 32, 3)
  raw = datasets.load_raw_dataset(cfg, "train")
  assert raw.shape == (100, 32, 32, 3)


def test_npz_loader(tmp_path):
  imgs = np.random.default_rng(0).integers(
      0, 256, (32, 16, 16, 3), dtype=np.int64).astype(np.uint8)
  np.savez(tmp_path / "train.npz", images=imgs)
  np.savez(tmp_path / "test.npz", images=imgs[:8])
  cfg = _config(tmp_path=tmp_path, dataset="NPZ", batch=4, size=16)
  train_it, eval_it = datasets.get_dataset(cfg)
  assert next(train_it).shape == (4, 16, 16, 3)


def test_folder_loader(tmp_path):
  from PIL import Image
  d = tmp_path / "train"
  d.mkdir()
  rng = np.random.default_rng(0)
  for i in range(6):
    Image.fromarray(rng.integers(0, 256, (48, 64, 3),
                                 dtype=np.int64).astype(np.uint8)).save(
        d / f"img_{i}.png")
  (tmp_path / "test").mkdir()
  Image.fromarray(rng.integers(0, 256, (48, 64, 3),
                               dtype=np.int64).astype(np.uint8)).save(
      tmp_path / "test" / "img.png")
  cfg = _config(tmp_path=tmp_path, dataset="FOLDER", batch=2, size=32)
  train_it, _ = datasets.get_dataset(cfg)
  b = next(train_it)
  assert b.shape == (2, 32, 32, 3)


def test_crop_resize_square():
  img = np.random.default_rng(0).integers(
      0, 256, (40, 60, 3), dtype=np.int64).astype(np.uint8)
  out = datasets.crop_resize(img, 32)
  assert out.shape == (32, 32, 3)


def test_central_crop():
  img = np.arange(5 * 7 * 1).reshape(5, 7, 1).astype(np.uint8)
  out = datasets.central_crop(img, 3)
  assert out.shape == (3, 3, 1)


def test_iterator_is_infinite_and_drops_remainder():
  imgs = np.zeros((10, 8, 8, 3), np.uint8)
  it = datasets.DatasetIterator(imgs, 4, prefetch=False)
  seen = [next(it) for _ in range(10)]  # 2 batches/epoch, 5 epochs
  assert all(b.shape == (4, 8, 8, 3) for b in seen)


def test_deterministic_given_seed():
  imgs = np.random.default_rng(3).integers(
      0, 256, (16, 8, 8, 3), dtype=np.int64).astype(np.uint8)
  it1 = datasets.DatasetIterator(imgs, 4, seed=7, prefetch=False)
  it2 = datasets.DatasetIterator(imgs, 4, seed=7, prefetch=False)
  np.testing.assert_array_equal(next(it1), next(it2))


def test_make_grid_and_save_image(tmp_path):
  from score_sde_pytorch_tpu.utils.image import make_grid, save_image
  imgs = np.random.default_rng(0).random((6, 8, 8, 3)).astype(np.float32)
  grid = make_grid(imgs, nrow=3, padding=1)
  assert grid.shape == (2 * 9 + 1, 3 * 9 + 1, 3)
  path = tmp_path / "grid.png"
  save_image(grid, str(path))
  from PIL import Image
  loaded = np.asarray(Image.open(path))
  assert loaded.shape == (19, 28, 3)


def test_celeba_preprocessing_chain(tmp_path):
  """CELEBA: central_crop(140) → resize_small (reference datasets.py:112-117)."""
  from PIL import Image
  d = tmp_path / "train"
  d.mkdir()
  (tmp_path / "test").mkdir()
  rng = np.random.default_rng(0)
  img = rng.integers(0, 256, (218, 178, 3), dtype=np.int64).astype(np.uint8)
  Image.fromarray(img).save(d / "a.png")
  Image.fromarray(img).save(tmp_path / "test" / "a.png")
  cfg = _config(tmp_path=tmp_path, dataset="CELEBA", batch=1, size=64)
  raw = datasets.materialize(datasets.load_raw_dataset(cfg, "train"))
  assert raw.shape == (1, 64, 64, 3)
  want = datasets.resize_small(datasets.central_crop(img, 140), 64)
  np.testing.assert_array_equal(raw[0], want)


def test_io_utils_local_paths(tmp_path):
  from score_sde_pytorch_tpu.utils import io as io_utils
  d = tmp_path / "sub" / "dir"
  io_utils.makedirs(str(d))
  assert io_utils.exists(str(d))
  p = d / "x.npz"
  io_utils.save_npz(str(p), a=np.arange(4))
  with io_utils.open_file(str(p), "rb") as f:
    with np.load(f) as z:
      np.testing.assert_array_equal(z["a"], np.arange(4))
  assert not io_utils.exists(str(tmp_path / "nope"))
