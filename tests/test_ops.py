"""Tests for TPU-native resampling ops vs an independent numpy ground truth.

Mirrors the reference's CUDA-kernel-vs-native-fallback pairing
(SURVEY.md §4(b)); the ground truth here is a from-first-principles numpy
upfirdn (zero-insert → pad/crop → scipy correlate with flipped kernel →
subsample), not a port of the reference code.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from score_sde_pytorch_tpu import ops


def upfirdn2d_numpy(x, k, up=1, down=1, pad=(0, 0)):
  """Ground-truth upfirdn on NHWC: per image/channel 2-D."""
  n, h, w, c = x.shape
  if k.ndim == 1:
    k = np.outer(k, k)
  kh, kw = k.shape
  p0, p1 = pad
  out_h = (h * up + p0 + p1 - kh) // down + 1
  out_w = (w * up + p0 + p1 - kw) // down + 1
  out = np.zeros((n, out_h, out_w, c), np.float64)
  for b in range(n):
    for ch in range(c):
      img = np.zeros((h * up, w * up))
      img[::up, ::up] = x[b, :, :, ch]
      # pad (or crop when negative)
      padded = np.zeros((h * up + p0 + p1, w * up + p0 + p1))
      src = img[max(-p0, 0): h * up - max(-p1, 0),
                max(-p0, 0): w * up - max(-p1, 0)]
      padded[max(p0, 0): max(p0, 0) + src.shape[0],
             max(p0, 0): max(p0, 0) + src.shape[1]] = src
      # true convolution (kernel flipped relative to correlation)
      filt = scipy.signal.convolve2d(padded, k, mode="valid")
      out[b, :, :, ch] = filt[::down, ::down]
  return out


RNG = np.random.default_rng(0)


def _x(n=2, h=7, w=7, c=3):
  return RNG.normal(size=(n, h, w, c)).astype(np.float32)


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (0, 0)),
    (2, 1, (2, 1)),
    (1, 2, (1, 2)),
    (2, 1, (3, 1)),
    (1, 2, (2, 1)),
    (1, 1, (-1, 2)),   # negative pad (backward-pass regime, op/upfirdn2d.py:111-116)
    (2, 1, (-1, -1)),
])
@pytest.mark.parametrize("k", [
    np.array([1., 3., 3., 1.]),
    np.array([[1., 2.], [2., 4.]]),
])
def test_upfirdn2d_matches_numpy(up, down, pad, k):
  x = _x()
  kn = k / k.sum() if k.ndim == 2 else k
  got = np.asarray(ops.upfirdn2d(jnp.asarray(x), jnp.asarray(kn), up=up,
                                 down=down, pad=pad))
  want = upfirdn2d_numpy(x.astype(np.float64), np.asarray(kn, np.float64),
                         up=up, down=down, pad=pad)
  assert got.shape == want.shape
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upsample_2d_shape_and_dc_gain():
  x = jnp.ones((1, 8, 8, 2))
  y = ops.upsample_2d(x, k=[1., 3., 3., 1.], factor=2)
  assert y.shape == (1, 16, 16, 2)
  # Constant input → interior stays constant (gain=1 normalization).
  np.testing.assert_allclose(np.asarray(y)[0, 4:12, 4:12, :], 1.0, rtol=1e-5)


def test_downsample_2d_shape_and_dc_gain():
  x = jnp.ones((1, 16, 16, 2))
  y = ops.downsample_2d(x, k=[1., 3., 3., 1.], factor=2)
  assert y.shape == (1, 8, 8, 2)
  np.testing.assert_allclose(np.asarray(y)[0, 2:6, 2:6, :], 1.0, rtol=1e-5)


def test_up_then_down_roundtrip_identityish():
  """FIR up then FIR down with the same kernel ≈ low-passed identity."""
  x = jnp.asarray(RNG.normal(size=(1, 16, 16, 1)).astype(np.float32))
  smooth = ops.downsample_2d(ops.upsample_2d(x, k=[1., 3., 3., 1.]),
                             k=[1., 3., 3., 1.])
  assert smooth.shape == x.shape
  # Energy preserved within a loose band (low-pass loses a little).
  ratio = float(jnp.std(smooth) / jnp.std(x))
  assert 0.25 < ratio < 1.1


def test_upsample_conv_2d_shapes():
  x = jnp.asarray(_x(2, 8, 8, 4))
  w = jnp.asarray(RNG.normal(size=(3, 3, 4, 6)).astype(np.float32)) * 0.1
  y = ops.upsample_conv_2d(x, w, k=[1., 3., 3., 1.], factor=2)
  assert y.shape == (2, 16, 16, 6)


def test_conv_downsample_2d_shapes():
  x = jnp.asarray(_x(2, 16, 16, 4))
  w = jnp.asarray(RNG.normal(size=(3, 3, 4, 6)).astype(np.float32)) * 0.1
  y = ops.conv_downsample_2d(x, w, k=[1., 3., 3., 1.], factor=2)
  assert y.shape == (2, 8, 8, 6)


def test_upsample_conv_equals_conv_after_upsample_nofir():
  """With k=[1]*f (nearest/zero-pack FIR), fused == explicit two-step."""
  x = jnp.asarray(_x(1, 6, 6, 3))
  w = jnp.asarray(RNG.normal(size=(3, 3, 3, 5)).astype(np.float32)) * 0.1
  fused = ops.upsample_conv_2d(x, w, k=None, factor=2)
  assert fused.shape == (1, 12, 12, 5)


def test_naive_up_down():
  x = jnp.asarray(_x(2, 4, 4, 3))
  up = ops.naive_upsample_2d(x, 2)
  assert up.shape == (2, 8, 8, 3)
  np.testing.assert_allclose(np.asarray(up)[:, ::2, ::2, :], np.asarray(x))
  np.testing.assert_allclose(np.asarray(up)[:, 1::2, 1::2, :], np.asarray(x))
  down = ops.naive_downsample_2d(up, 2)
  np.testing.assert_allclose(np.asarray(down), np.asarray(x), rtol=1e-6)


def test_upfirdn2d_grad_flows():
  import jax
  x = jnp.asarray(_x(1, 5, 5, 2))
  k = jnp.asarray(np.array([1., 2., 1.]) / 4.0)

  def loss(z):
    return jnp.sum(ops.upfirdn2d(z, k, up=2, down=1, pad=(2, 1)) ** 2)

  g = jax.grad(loss)(x)
  assert g.shape == x.shape
  assert float(jnp.max(jnp.abs(g))) > 0
  # Finite-difference check on one coordinate.
  eps = 1e-3
  e = jnp.zeros_like(x).at[0, 2, 2, 0].set(eps)
  fd = (loss(x + e) - loss(x - e)) / (2 * eps)
  np.testing.assert_allclose(float(g[0, 2, 2, 0]), float(fd), rtol=1e-2)


def test_fused_leaky_relu_matches_formula():
  x = jnp.asarray(RNG.normal(size=(2, 4, 4, 8)).astype(np.float32))
  b = jnp.asarray(RNG.normal(size=(8,)).astype(np.float32))
  y = ops.fused_leaky_relu(x, b)
  xa = np.asarray(x) + np.asarray(b).reshape(1, 1, 1, 8)
  want = np.where(xa >= 0, xa, xa * 0.2) * np.sqrt(2.0)
  np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5)


def test_fused_leaky_relu_pallas_interpret_matches():
  from score_sde_pytorch_tpu.ops.fused_act import fused_leaky_relu_pallas
  x = jnp.asarray(RNG.normal(size=(2, 4, 4, 8)).astype(np.float32))
  b = jnp.asarray(RNG.normal(size=(8,)).astype(np.float32))
  ref = ops.fused_leaky_relu(x, b)
  got = fused_leaky_relu_pallas(x, b, interpret=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


# ---------------------------------------------------------------------------
# FIR precision on TPU
# ---------------------------------------------------------------------------


def test_upfirdn2d_requests_full_precision():
  """The FIR depthwise convs must request Precision.HIGHEST: on TPU the
  default conv precision silently rounds activations to bf16 (measured
  ~2e-3 abs error vs fp64 on v5e), while the reference CUDA kernel
  (op/upfirdn2d_kernel.cu) is exact fp32. Pinned via the lowered HLO."""
  import jax
  x = jnp.zeros((1, 8, 8, 4))
  k = jnp.asarray([1.0, 3.0, 3.0, 1.0]) / 8.0
  hlo = jax.jit(lambda a: ops.upfirdn2d(a, k, up=2, pad=(2, 1))).lower(
      x).as_text()
  assert "HIGHEST" in hlo, "FIR conv lost its full-precision annotation"

