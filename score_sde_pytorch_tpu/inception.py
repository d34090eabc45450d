"""InceptionV3 feature extractor in pure JAX (for FID/IS/KID).

Replaces the reference's TF-Hub Inception graph
(/root/reference/evaluation.py:35-40). The network follows the canonical
FID Inception architecture (TF "frozen inception v3 2015" as ported by
pytorch-fid): pool_3 gives 2048-d features, the final fc gives 1008 logits.

Weights load from an .npz of the pytorch-fid / torchvision-style state_dict
(keys like ``Mixed_5b.branch1x1.conv.weight`` in OIHW; converted to HWIO at
load). This environment is zero-egress, so weights must be provided locally
via the INCEPTION_WEIGHTS_NPZ env var; `evaluation.run_inception` degrades
gracefully when absent.

Architectural notes matching the FID weights exactly:
* BatchNorm eps = 1e-3, folded into scale/shift at load time (inference).
* In-block 3x3 avg pools use count_include_pad=False.
* Mixed_7b uses avg-pool in its pool branch; Mixed_7c uses max-pool.
* Input: uint8 NHWC → bilinear resize to 299 → scaled to [−1, 1].
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array


def _fold_bn(params: Dict[str, np.ndarray], prefix: str):
  """Fold BN(eps=1e-3) into (scale, shift) per channel."""
  gamma = params[f"{prefix}.bn.weight"]
  beta = params[f"{prefix}.bn.bias"]
  mean = params[f"{prefix}.bn.running_mean"]
  var = params[f"{prefix}.bn.running_var"]
  scale = gamma / np.sqrt(var + 1e-3)
  shift = beta - mean * scale
  return scale.astype(np.float32), shift.astype(np.float32)


def _validate_raw(raw: Dict[str, np.ndarray]):
  """Strict key/shape validation against `weight_spec` (VERDICT r4 #5):
  a truncated or mis-exported npz must fail loudly here, not as a silently
  wrong FID. Expects the converter's state_dict layout: per conv block
  ``<name>.conv.weight`` (OIHW) + 4 BN arrays of shape (out,)."""
  problems = []
  for name, kh, kw, cin, cout in weight_spec():
    w_key = f"{name}.conv.weight"
    if w_key not in raw:
      problems.append(f"missing {w_key}")
    elif tuple(raw[w_key].shape) != (cout, cin, kh, kw):
      problems.append(f"{w_key}: shape {tuple(raw[w_key].shape)} != "
                      f"OIHW {(cout, cin, kh, kw)}")
    for bn in ("weight", "bias", "running_mean", "running_var"):
      b_key = f"{name}.bn.{bn}"
      if b_key not in raw:
        problems.append(f"missing {b_key}")
      elif tuple(raw[b_key].shape) != (cout,):
        problems.append(f"{b_key}: shape {tuple(raw[b_key].shape)} != "
                        f"({cout},)")
  if "fc.weight" in raw and tuple(raw["fc.weight"].shape)[1] != 2048:
    problems.append(f"fc.weight: shape {tuple(raw['fc.weight'].shape)} — "
                    "expected (num_classes, 2048)")
  if problems:
    head = "; ".join(problems[:8])
    raise ValueError(
        f"Inception weights npz fails the FID-InceptionV3 schema "
        f"({len(problems)} problems): {head}"
        f"{' ...' if len(problems) > 8 else ''} — re-export with "
        "tools/convert_inception_weights.py")


def load_params(npz_path: str) -> Dict[str, jnp.ndarray]:
  raw = dict(np.load(npz_path))
  _validate_raw(raw)
  out: Dict[str, jnp.ndarray] = {}
  for key, val in raw.items():
    if key.endswith(".conv.weight"):
      # OIHW → HWIO
      out[key] = jnp.asarray(np.transpose(val, (2, 3, 1, 0)), jnp.float32)
  done = set()
  for key in raw:
    if ".bn." in key:
      prefix = key.split(".bn.")[0]
      if prefix in done:
        continue
      scale, shift = _fold_bn(raw, prefix)
      out[f"{prefix}.scale"] = jnp.asarray(scale)
      out[f"{prefix}.shift"] = jnp.asarray(shift)
      done.add(prefix)
  if "fc.weight" in raw:
    out["fc.weight"] = jnp.asarray(raw["fc.weight"].T, jnp.float32)  # [in,out]
    out["fc.bias"] = jnp.asarray(raw["fc.bias"], jnp.float32)
  return out


def _conv_bn(p, x: Array, name: str, stride=1, padding=((0, 0), (0, 0))):
  if isinstance(stride, int):
    stride = (stride, stride)
  y = lax.conv_general_dilated(
      x, p[f"{name}.conv.weight"], window_strides=stride, padding=padding,
      dimension_numbers=("NHWC", "HWIO", "NHWC"))
  y = y * p[f"{name}.scale"] + p[f"{name}.shift"]
  return jax.nn.relu(y)


def _avg_pool_3x3_noinc(x: Array) -> Array:
  """3x3 stride-1 avg pool, pad 1, count_include_pad=False."""
  ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
  summed = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                             [(0, 0), (1, 1), (1, 1), (0, 0)])
  counts = lax.reduce_window(ones, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                             [(0, 0), (1, 1), (1, 1), (0, 0)])
  return summed / counts


def _max_pool(x: Array, window=3, stride=2, pad=0) -> Array:
  return lax.reduce_window(
      x, -jnp.inf, lax.max, (1, window, window, 1), (1, stride, stride, 1),
      [(0, 0), (pad, pad), (pad, pad), (0, 0)])


_P0 = ((0, 0), (0, 0))
_P1 = ((1, 1), (1, 1))


def _inception_a(p, x, name):
  b1 = _conv_bn(p, x, f"{name}.branch1x1")
  b5 = _conv_bn(p, x, f"{name}.branch5x5_1")
  b5 = _conv_bn(p, b5, f"{name}.branch5x5_2", padding=((2, 2), (2, 2)))
  b3 = _conv_bn(p, x, f"{name}.branch3x3dbl_1")
  b3 = _conv_bn(p, b3, f"{name}.branch3x3dbl_2", padding=_P1)
  b3 = _conv_bn(p, b3, f"{name}.branch3x3dbl_3", padding=_P1)
  bp = _conv_bn(p, _avg_pool_3x3_noinc(x), f"{name}.branch_pool")
  return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x, name):
  b3 = _conv_bn(p, x, f"{name}.branch3x3", stride=2)
  bd = _conv_bn(p, x, f"{name}.branch3x3dbl_1")
  bd = _conv_bn(p, bd, f"{name}.branch3x3dbl_2", padding=_P1)
  bd = _conv_bn(p, bd, f"{name}.branch3x3dbl_3", stride=2)
  bp = _max_pool(x)
  return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x, name):
  p17 = ((0, 0), (3, 3))
  p71 = ((3, 3), (0, 0))
  b1 = _conv_bn(p, x, f"{name}.branch1x1")
  b7 = _conv_bn(p, x, f"{name}.branch7x7_1")
  b7 = _conv_bn(p, b7, f"{name}.branch7x7_2", padding=p17)
  b7 = _conv_bn(p, b7, f"{name}.branch7x7_3", padding=p71)
  bd = _conv_bn(p, x, f"{name}.branch7x7dbl_1")
  bd = _conv_bn(p, bd, f"{name}.branch7x7dbl_2", padding=p71)
  bd = _conv_bn(p, bd, f"{name}.branch7x7dbl_3", padding=p17)
  bd = _conv_bn(p, bd, f"{name}.branch7x7dbl_4", padding=p71)
  bd = _conv_bn(p, bd, f"{name}.branch7x7dbl_5", padding=p17)
  bp = _conv_bn(p, _avg_pool_3x3_noinc(x), f"{name}.branch_pool")
  return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x, name):
  b3 = _conv_bn(p, x, f"{name}.branch3x3_1")
  b3 = _conv_bn(p, b3, f"{name}.branch3x3_2", stride=2)
  b7 = _conv_bn(p, x, f"{name}.branch7x7x3_1")
  b7 = _conv_bn(p, b7, f"{name}.branch7x7x3_2", padding=((0, 0), (3, 3)))
  b7 = _conv_bn(p, b7, f"{name}.branch7x7x3_3", padding=((3, 3), (0, 0)))
  b7 = _conv_bn(p, b7, f"{name}.branch7x7x3_4", stride=2)
  bp = _max_pool(x)
  return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x, name, pool: str):
  p13 = ((0, 0), (1, 1))
  p31 = ((1, 1), (0, 0))
  b1 = _conv_bn(p, x, f"{name}.branch1x1")
  b3 = _conv_bn(p, x, f"{name}.branch3x3_1")
  b3 = jnp.concatenate([
      _conv_bn(p, b3, f"{name}.branch3x3_2a", padding=p13),
      _conv_bn(p, b3, f"{name}.branch3x3_2b", padding=p31)], axis=-1)
  bd = _conv_bn(p, x, f"{name}.branch3x3dbl_1")
  bd = _conv_bn(p, bd, f"{name}.branch3x3dbl_2", padding=_P1)
  bd = jnp.concatenate([
      _conv_bn(p, bd, f"{name}.branch3x3dbl_3a", padding=p13),
      _conv_bn(p, bd, f"{name}.branch3x3dbl_3b", padding=p31)], axis=-1)
  if pool == "avg":
    bp = _avg_pool_3x3_noinc(x)
  else:  # Mixed_7c uses max pool in the FID graph
    bp = _max_pool(x, window=3, stride=1, pad=1)
  bp = _conv_bn(p, bp, f"{name}.branch_pool")
  return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def _forward(p, x: Array):
  """x: float NHWC in [−1, 1] at 299×299. Returns (pool_3, logits)."""
  x = _conv_bn(p, x, "Conv2d_1a_3x3", stride=2)
  x = _conv_bn(p, x, "Conv2d_2a_3x3")
  x = _conv_bn(p, x, "Conv2d_2b_3x3", padding=_P1)
  x = _max_pool(x)
  x = _conv_bn(p, x, "Conv2d_3b_1x1")
  x = _conv_bn(p, x, "Conv2d_4a_3x3")
  x = _max_pool(x)
  x = _inception_a(p, x, "Mixed_5b")
  x = _inception_a(p, x, "Mixed_5c")
  x = _inception_a(p, x, "Mixed_5d")
  x = _inception_b(p, x, "Mixed_6a")
  x = _inception_c(p, x, "Mixed_6b")
  x = _inception_c(p, x, "Mixed_6c")
  x = _inception_c(p, x, "Mixed_6d")
  x = _inception_c(p, x, "Mixed_6e")
  x = _inception_d(p, x, "Mixed_7a")
  x = _inception_e(p, x, "Mixed_7b", pool="avg")
  x = _inception_e(p, x, "Mixed_7c", pool="max")
  pool = jnp.mean(x, axis=(1, 2))  # global avg pool → [N, 2048]
  if "fc.weight" in p:
    logits = pool @ p["fc.weight"] + p["fc.bias"]
  else:
    logits = None
  return pool, logits


def weight_spec():
  """(name, kh, kw, in_ch, out_ch) for every conv; the architecture table."""
  spec = [
      ("Conv2d_1a_3x3", 3, 3, 3, 32),
      ("Conv2d_2a_3x3", 3, 3, 32, 32),
      ("Conv2d_2b_3x3", 3, 3, 32, 64),
      ("Conv2d_3b_1x1", 1, 1, 64, 80),
      ("Conv2d_4a_3x3", 3, 3, 80, 192),
  ]

  def inc_a(name, in_ch, pool_ch):
    spec.extend([
        (f"{name}.branch1x1", 1, 1, in_ch, 64),
        (f"{name}.branch5x5_1", 1, 1, in_ch, 48),
        (f"{name}.branch5x5_2", 5, 5, 48, 64),
        (f"{name}.branch3x3dbl_1", 1, 1, in_ch, 64),
        (f"{name}.branch3x3dbl_2", 3, 3, 64, 96),
        (f"{name}.branch3x3dbl_3", 3, 3, 96, 96),
        (f"{name}.branch_pool", 1, 1, in_ch, pool_ch),
    ])
    return 64 + 64 + 96 + pool_ch

  def inc_b(name, in_ch):
    spec.extend([
        (f"{name}.branch3x3", 3, 3, in_ch, 384),
        (f"{name}.branch3x3dbl_1", 1, 1, in_ch, 64),
        (f"{name}.branch3x3dbl_2", 3, 3, 64, 96),
        (f"{name}.branch3x3dbl_3", 3, 3, 96, 96),
    ])
    return 384 + 96 + in_ch

  def inc_c(name, in_ch, c7):
    spec.extend([
        (f"{name}.branch1x1", 1, 1, in_ch, 192),
        (f"{name}.branch7x7_1", 1, 1, in_ch, c7),
        (f"{name}.branch7x7_2", 1, 7, c7, c7),
        (f"{name}.branch7x7_3", 7, 1, c7, 192),
        (f"{name}.branch7x7dbl_1", 1, 1, in_ch, c7),
        (f"{name}.branch7x7dbl_2", 7, 1, c7, c7),
        (f"{name}.branch7x7dbl_3", 1, 7, c7, c7),
        (f"{name}.branch7x7dbl_4", 7, 1, c7, c7),
        (f"{name}.branch7x7dbl_5", 1, 7, c7, 192),
        (f"{name}.branch_pool", 1, 1, in_ch, 192),
    ])
    return 4 * 192

  def inc_d(name, in_ch):
    spec.extend([
        (f"{name}.branch3x3_1", 1, 1, in_ch, 192),
        (f"{name}.branch3x3_2", 3, 3, 192, 320),
        (f"{name}.branch7x7x3_1", 1, 1, in_ch, 192),
        (f"{name}.branch7x7x3_2", 1, 7, 192, 192),
        (f"{name}.branch7x7x3_3", 7, 1, 192, 192),
        (f"{name}.branch7x7x3_4", 3, 3, 192, 192),
    ])
    return 320 + 192 + in_ch

  def inc_e(name, in_ch):
    spec.extend([
        (f"{name}.branch1x1", 1, 1, in_ch, 320),
        (f"{name}.branch3x3_1", 1, 1, in_ch, 384),
        (f"{name}.branch3x3_2a", 1, 3, 384, 384),
        (f"{name}.branch3x3_2b", 3, 1, 384, 384),
        (f"{name}.branch3x3dbl_1", 1, 1, in_ch, 448),
        (f"{name}.branch3x3dbl_2", 3, 3, 448, 384),
        (f"{name}.branch3x3dbl_3a", 1, 3, 384, 384),
        (f"{name}.branch3x3dbl_3b", 3, 1, 384, 384),
        (f"{name}.branch_pool", 1, 1, in_ch, 192),
    ])
    return 320 + 768 + 768 + 192

  c = inc_a("Mixed_5b", 192, 32)
  c = inc_a("Mixed_5c", c, 64)
  c = inc_a("Mixed_5d", c, 64)
  c = inc_b("Mixed_6a", c)
  c = inc_c("Mixed_6b", c, 128)
  c = inc_c("Mixed_6c", c, 160)
  c = inc_c("Mixed_6d", c, 160)
  c = inc_c("Mixed_6e", c, 192)
  c = inc_d("Mixed_7a", c)
  c = inc_e("Mixed_7b", c)
  c = inc_e("Mixed_7c", c)
  assert c == 2048
  return spec


def random_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
  """Random weights with the exact architecture shapes (tests/smoke)."""
  rng = np.random.default_rng(seed)
  p: Dict[str, jnp.ndarray] = {}
  for name, kh, kw, cin, cout in weight_spec():
    fan_in = kh * kw * cin
    p[f"{name}.conv.weight"] = jnp.asarray(
        rng.normal(0, 1 / np.sqrt(fan_in), (kh, kw, cin, cout)), jnp.float32)
    p[f"{name}.scale"] = jnp.ones((cout,), jnp.float32)
    p[f"{name}.shift"] = jnp.zeros((cout,), jnp.float32)
  p["fc.weight"] = jnp.asarray(rng.normal(0, 0.02, (2048, 1008)), jnp.float32)
  p["fc.bias"] = jnp.zeros((1008,), jnp.float32)
  return p


class InceptionV3Features:
  """Callable: uint8 NHWC images → dict(pool_3, logits).

  Feature extraction is data-parallel over all local devices when more than
  one is available (the TPU-native analogue of the reference's per-device
  tf.device Inception sharding, evaluation.py:107-146) — the jit below is
  given a batch-sharded input so XLA SPMD splits the work.
  """

  def __init__(self, npz_path: str, batch: int = 64, shard: bool = True):
    self.params = load_params(npz_path)
    n_dev = jax.local_device_count()
    if shard and n_dev > 1:
      batch = max(batch, n_dev) // n_dev * n_dev
      from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
      mesh = Mesh(np.array(jax.local_devices()), ("data",))
      self._in_sharding = NamedSharding(mesh, P("data"))
    else:
      self._in_sharding = None
    self.batch = batch

    @jax.jit
    def run(params, imgs_u8):
      x = imgs_u8.astype(jnp.float32) / 255.0
      b = x.shape[0]
      x = jax.image.resize(x, (b, 299, 299, x.shape[-1]), method="bilinear")
      if x.shape[-1] == 1:
        x = jnp.tile(x, (1, 1, 1, 3))
      x = x * 2.0 - 1.0
      return _forward(params, x)

    self._run = run

  def __call__(self, images_u8: np.ndarray):
    pools, logits = [], []
    n = images_u8.shape[0]
    bs = self.batch
    # Pad the tail batch to a fixed shape (avoid recompiles).
    for start in range(0, n, bs):
      chunk = images_u8[start:start + bs]
      pad = bs - chunk.shape[0]
      if pad:
        chunk = np.concatenate(
            [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
      device_chunk = (jax.device_put(chunk, self._in_sharding)
                      if self._in_sharding is not None else jnp.asarray(chunk))
      pool, lg = self._run(self.params, device_chunk)
      pools.append(np.asarray(pool)[:bs - pad if pad else bs])
      if lg is not None:
        logits.append(np.asarray(lg)[:bs - pad if pad else bs])
    out = {"pool_3": np.concatenate(pools)}
    if logits:
      out["logits"] = np.concatenate(logits)
    return out
