"""Sample-quality evaluation: FID / Inception Score / KID in pure JAX.

Rebuild of /root/reference/evaluation.py + the tensorflow_gan calls at
run_lib.py:387-397. The tfgan/tfhub stack is replaced by on-device matrix
math (SURVEY.md §2.8):

* **FID** — Fréchet distance computed fully on device: the matrix-sqrt
  trace uses the symmetric eigh form (robust to rank-deficient sample
  covariances); a Newton–Schulz matmul-only sqrtm is also provided. scipy
  remains the test oracle.
* **IS** — classifier score from logits: exp(E[KL(p(y|x) || p(y))]).
* **KID** — unbiased polynomial-kernel MMD² (block estimator).

The Inception feature extractor itself needs pretrained weights, which a
zero-egress environment cannot download; `run_inception` loads a local
weights file if `INCEPTION_WEIGHTS_NPZ` (or config) points at one and
returns None otherwise, letting the eval pipeline skip statistics cleanly.
Pre-computed dataset stats load from `assets/stats/` exactly like the
reference (evaluation.py:43-56).
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

INCEPTION_DEFAULT_SIZE = 299


# ---------------------------------------------------------------------------
# Matrix sqrt via Newton–Schulz (TPU-friendly: matmuls only)
# ---------------------------------------------------------------------------


def sqrtm_newton_schulz(a: Array, num_iters: int = 50) -> Array:
  """Matrix square root of a PSD matrix by Newton–Schulz iteration.

  All-matmul formulation: Y_{k+1} = Y_k (3I − Z_k Y_k)/2,
  Z_{k+1} = (3I − Z_k Y_k) Z_k / 2 with Y→A^{1/2}/√‖A‖, Z→A^{−1/2}·√‖A‖.
  """
  dim = a.shape[0]
  norm = jnp.linalg.norm(a)  # Frobenius
  y = a / norm
  eye = jnp.eye(dim, dtype=a.dtype)
  z = eye

  def body(_, carry):
    y, z = carry
    t = 0.5 * (3.0 * eye - z @ y)
    return (y @ t, t @ z)

  y, z = jax.lax.fori_loop(0, num_iters, body, (y, z))
  return y * jnp.sqrt(norm)


@jax.jit
def frechet_distance(mu1: Array, sigma1: Array, mu2: Array,
                     sigma2: Array) -> Array:
  """FID: ‖mu1−mu2‖² + tr(S1 + S2 − 2(S1 S2)^{1/2}).

  tr((S1 S2)^{1/2}) is computed via the symmetric form
  tr((S1^{1/2} S2 S1^{1/2})^{1/2}) so Newton–Schulz only ever sees PSD
  matrices — the raw product S1@S2 is non-symmetric and NS diverges on it
  when a covariance is rank-deficient (small sample counts)."""
  diff = mu1 - mu2
  dim = sigma1.shape[0]
  # Trace-relative regularization keeps rank-deficient covariances PSD>0.
  eps1 = 1e-6 * jnp.maximum(1.0, jnp.trace(sigma1) / dim)
  eps2 = 1e-6 * jnp.maximum(1.0, jnp.trace(sigma2) / dim)
  eye = jnp.eye(dim, dtype=sigma1.dtype)
  s1 = sigma1 + eye * eps1
  s2 = sigma2 + eye * eps2
  # root1 via eigh (Newton–Schulz diverges in fp32 on the condition numbers
  # rank-deficient sample covariances produce).
  w1, v1 = jnp.linalg.eigh(s1)
  root1 = (v1 * jnp.sqrt(jnp.maximum(w1, 0.0))) @ v1.T
  inner = root1 @ s2 @ root1
  inner = 0.5 * (inner + inner.T)  # clean numerical asymmetry
  w = jnp.linalg.eigvalsh(inner)
  tr_covmean = jnp.sum(jnp.sqrt(jnp.maximum(w, 0.0)))
  return (jnp.dot(diff, diff) + jnp.trace(s1) + jnp.trace(s2)
          - 2.0 * tr_covmean)


def fid_from_activations(act1: Array, act2: Array) -> float:
  """FID between two activation sets [N, D] (tfgan
  frechet_classifier_distance_from_activations equivalent)."""
  act1 = jnp.asarray(act1, jnp.float64) if jax.config.jax_enable_x64 \
      else jnp.asarray(act1, jnp.float32)
  act2 = jnp.asarray(act2, act1.dtype)
  mu1, mu2 = jnp.mean(act1, axis=0), jnp.mean(act2, axis=0)
  sigma1 = jnp.cov(act1, rowvar=False)
  sigma2 = jnp.cov(act2, rowvar=False)
  return float(frechet_distance(mu1, sigma1, mu2, sigma2))


def fid_from_stats(act: Array, mu2: Array, sigma2: Array) -> float:
  """FID against pre-computed dataset statistics (reference assets/stats)."""
  act = jnp.asarray(act, jnp.float32)
  mu1 = jnp.mean(act, axis=0)
  sigma1 = jnp.cov(act, rowvar=False)
  return float(frechet_distance(mu1, sigma1, jnp.asarray(mu2),
                                jnp.asarray(sigma2)))


@jax.jit
def _is_from_logits(logits: Array) -> Array:
  log_probs = jax.nn.log_softmax(logits, axis=-1)
  probs = jnp.exp(log_probs)
  marginal = jnp.mean(probs, axis=0)
  kl = jnp.sum(probs * (log_probs - jnp.log(marginal)[None, :]), axis=-1)
  return jnp.exp(jnp.mean(kl))


def inception_score_from_logits(logits: Array) -> float:
  """IS (tfgan classifier_score_from_logits equivalent)."""
  return float(_is_from_logits(jnp.asarray(logits, jnp.float32)))


def kid_from_activations(act1: Array, act2: Array,
                         block_size: int = 1000) -> float:
  """Unbiased KID (kernel MMD², polynomial kernel (x·y/d + 1)³) with tfgan's
  block-averaged estimator."""
  act1 = np.asarray(act1, np.float64)
  act2 = np.asarray(act2, np.float64)
  n1, d = act1.shape
  n2 = act2.shape[0]
  n_blocks = max(1, min(n1, n2) // block_size)

  def kernel(x, y):
    return (x @ y.T / d + 1.0) ** 3

  scores = []
  for i in range(n_blocks):
    x = act1[i * block_size:(i + 1) * block_size]
    y = act2[i * block_size:(i + 1) * block_size]
    m, n = x.shape[0], y.shape[0]
    k_xx = kernel(x, x)
    k_yy = kernel(y, y)
    k_xy = kernel(x, y)
    term_xx = (k_xx.sum() - np.trace(k_xx)) / (m * (m - 1))
    term_yy = (k_yy.sum() - np.trace(k_yy)) / (n * (n - 1))
    term_xy = k_xy.mean()
    scores.append(term_xx + term_yy - 2 * term_xy)
  return float(np.mean(scores))


# ---------------------------------------------------------------------------
# Inception feature extraction (gated on local weights — zero egress)
# ---------------------------------------------------------------------------

_INCEPTION_CACHE: Dict[str, object] = {}


def is_inceptionv3(config) -> bool:
  """≥256px metric protocol switch (reference run_lib.py:257-258): large
  images use the tf-hub InceptionV3 *feature_vector* network (pool features
  only) and IS is not computed (reference run_lib.py:389-391)."""
  return config is not None and config.data.image_size >= 256


def get_inception_weights_path(config=None,
                               inceptionv3: Optional[bool] = None
                               ) -> Optional[str]:
  """Resolve the local weights npz for the protocol-selected network.

  <256px → the 2015 FID graph weights (``INCEPTION_WEIGHTS_NPZ`` /
  ``config.eval.inception_weights``); ≥256px → the feature_vector network
  weights (``INCEPTION_V3_FEATURE_WEIGHTS_NPZ`` /
  ``config.eval.inception_feature_weights`` — an npz WITHOUT fc.* keys, so
  the extractor emits pool features only). Same npz mechanism either way;
  both remain env-gated in a zero-egress environment.
  """
  if inceptionv3 is None:
    inceptionv3 = is_inceptionv3(config)
  if inceptionv3:
    path = os.environ.get("INCEPTION_V3_FEATURE_WEIGHTS_NPZ", "")
    if not path and config is not None:
      path = config.eval.get("inception_feature_weights", "")
  else:
    path = os.environ.get("INCEPTION_WEIGHTS_NPZ", "")
    if not path and config is not None:
      path = config.eval.get("inception_weights", "")
  return path if path and os.path.exists(path) else None


def run_inception(images_u8: np.ndarray, config=None) -> Optional[Dict]:
  """Compute Inception pool features + logits for uint8 NHWC images.

  Returns dict(pool_3=[N,2048], logits=[N,1008]) or None when no weights are
  available (the caller skips stats, reference-style graceful degradation).
  """
  path = get_inception_weights_path(config)
  if path is None:
    logging.warning(
        "No Inception weights available (set INCEPTION_WEIGHTS_NPZ, or "
        "INCEPTION_V3_FEATURE_WEIGHTS_NPZ for the >=256px protocol); "
        "skipping FID/IS statistics.")
    return None
  from score_sde_pytorch_tpu.inception import InceptionV3Features
  if path not in _INCEPTION_CACHE:
    _INCEPTION_CACHE[path] = InceptionV3Features(path)
  model = _INCEPTION_CACHE[path]
  return model(images_u8)


def get_inception_model(inceptionv3: bool = False, config=None):
  """Reference-API alias (evaluation.py:35-40): returns the feature
  extractor or None when weights are unavailable. ``inceptionv3=True``
  selects the ≥256px feature_vector weights (pool-only npz) — the same
  architecture class serves both protocols, the weights file decides
  whether a logits head exists."""
  path = get_inception_weights_path(config, inceptionv3=inceptionv3)
  if path is None:
    return None
  from score_sde_pytorch_tpu.inception import InceptionV3Features
  if path not in _INCEPTION_CACHE:
    _INCEPTION_CACHE[path] = InceptionV3Features(path)
  return _INCEPTION_CACHE[path]


def run_inception_distributed(images_u8: np.ndarray, model=None,
                              config=None) -> Optional[Dict]:
  """Reference-API alias (evaluation.py:107-146). Device distribution is
  handled inside the extractor via batch sharding over the local mesh."""
  if model is not None:
    return model(images_u8)
  return run_inception(images_u8, config)


def load_dataset_stats(config) -> Dict:
  """Load pre-computed dataset stats npz (reference evaluation.py:43-56)."""
  data_name = config.data.dataset.lower()
  size = config.data.image_size
  candidates = [
      f"assets/stats/{data_name}_{size}_stats.npz",
      f"assets/stats/{data_name}_stats.npz",
  ]
  for c in candidates:
    if os.path.exists(c):
      with np.load(c) as z:
        return dict(z)
  raise FileNotFoundError(
      f"No dataset stats found for {data_name}@{size} (tried {candidates})")


def compute_scores(pool_acts: np.ndarray, config,
                   logits: Optional[np.ndarray] = None) -> Dict[str, float]:
  """Aggregate IS/FID/KID vs dataset stats (reference run_lib.py:380-397)."""
  out: Dict[str, float] = {}
  # IS is only defined for the <256px protocol (reference run_lib.py:389-391
  # computes it iff not inceptionv3), even if a logits head produced output.
  if logits is not None and not is_inceptionv3(config):
    out["inception_score"] = inception_score_from_logits(logits)
  try:
    stats = load_dataset_stats(config)
    if "mu" in stats and "sigma" in stats:
      out["fid"] = fid_from_stats(pool_acts, stats["mu"], stats["sigma"])
    elif "pool_3" in stats:
      out["fid"] = fid_from_activations(pool_acts, stats["pool_3"])
      out["kid"] = kid_from_activations(pool_acts, stats["pool_3"])
  except FileNotFoundError as e:
    logging.warning("%s", e)
  return out
