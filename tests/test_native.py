"""Native C++ data-loader tests (vs the Python pipeline's semantics)."""
import numpy as np
import pytest

from score_sde_pytorch_tpu.native import build


pytestmark = pytest.mark.skipif(not build.native_available(),
                                reason="g++ unavailable or build failed")


def _loader(**kw):
  from score_sde_pytorch_tpu.native import NativeDataLoader
  rng = np.random.default_rng(0)
  imgs = rng.integers(0, 256, (32, 8, 8, 3), dtype=np.int64).astype(np.uint8)
  defaults = dict(batch_size=4, shuffle=True, random_flip=False,
                  uniform_dequantization=False, seed=1, nthreads=2)
  defaults.update(kw)
  return imgs, NativeDataLoader(imgs, **defaults)


def test_shapes_and_range():
  _, dl = _loader()
  b = next(dl)
  assert b.shape == (4, 8, 8, 3)
  assert b.dtype == np.float32
  assert 0.0 <= b.min() and b.max() <= 1.0
  dl.close()


def test_epoch_covers_all_samples():
  # nthreads=1: with >1 worker, batch completion may interleave across the
  # epoch boundary (same semantics as parallel tf.data), so exact epoch
  # coverage is only guaranteed single-threaded.
  imgs, dl = _loader(shuffle=False, nthreads=1)
  seen = np.concatenate([next(dl) for _ in range(8)])  # 8*4 = 32 = one epoch
  want = imgs.astype(np.float32) / 255.0
  np.testing.assert_allclose(np.sort(seen.ravel()), np.sort(want.ravel()),
                             atol=1e-6)
  dl.close()


def test_shuffle_changes_order():
  imgs, dl = _loader(shuffle=True)
  b = next(dl)
  first_unshuffled = imgs[:4].astype(np.float32) / 255.0
  assert not np.allclose(b, first_unshuffled)
  dl.close()


def test_uniform_dequantization():
  _, dl = _loader(uniform_dequantization=True)
  b = next(dl)
  frac = (b * 256.0) % 1.0
  assert not np.allclose(frac, 0.0)
  assert b.max() <= 1.0
  dl.close()


def test_flip_only_mirrors_rows():
  imgs, dl = _loader(shuffle=False, random_flip=True, seed=123)
  b = next(dl)
  want = imgs[:4].astype(np.float32) / 255.0
  for i in range(4):
    straight = np.allclose(b[i], want[i])
    flipped = np.allclose(b[i], want[i][:, ::-1, :])
    assert straight or flipped
  dl.close()


def test_sustained_throughput():
  _, dl = _loader()
  for _ in range(50):
    b = next(dl)
  assert np.isfinite(b).all()
  dl.close()
