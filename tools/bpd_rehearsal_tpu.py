"""Bits/dim evidence-chain rehearsal on TPU (companion to fid_rehearsal_tpu).

The reference's second headline metric is likelihood (README.md:17,145 —
2.99 bits/dim, subVP DDPM++ continuous). Zero-egress blocks real CIFAR-10,
so this rehearses the ENTIRE likelihood chain — continuous subVP training →
Orbax checkpoints → ``run_lib.evaluate()``'s bpd stage (reference
run_lib.py:236-260: uniform-dequantized test split, repeated 5x, through
``likelihood.get_likelihood_fn``'s augmented probability-flow ODE with the
Hutchinson trace estimator) — on a dataset whose OPTIMAL bits/dim is known
in closed form, so the number itself is checkable, not just its trend:

  * dataset: uint8 images with iid pixels from a quantized clipped Gaussian
    N(127.5, 51^2) (the same N(0.5, 0.2^2)-in-[0,1] task the learning
    proofs pin). For uniformly-dequantized data the achievable bits/dim of
    ANY continuous density model is bounded below by the per-pixel discrete
    entropy H(p)/1 bits, and a perfect model attains it:
        H = -sum_k p_k log2 p_k,  p_k = Phi((k+1-mu)/sigma)-Phi((k-mu)/sigma)
    with the clipped tail mass absorbed into bins 0 and 255 (~7.725 bpd).
  * calibration is checked in BOTH directions: evaluate()'s bpd must fall
    toward the bound as training proceeds AND must never go below it
    (beyond Hutchinson/ODE-tolerance noise) — a miscalibrated offset chain
    (scaler, dequant, prior logp, trace sign) would violate one side.

Swap the NPZ for the real CIFAR-10 and the SAME command reproduces the
paper's NLL protocol (reference run_lib.py:236-260).

    python tools/bpd_rehearsal_tpu.py --workdir /tmp/bpd_rehearsal \
        [--n_iters 3000] [--snapshot_freq 1000] [--num_test 256]
"""
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("workdir", "/tmp/bpd_rehearsal", "Working directory.")
flags.DEFINE_integer("n_iters", 3000, "Training steps.")
flags.DEFINE_integer("snapshot_freq", 1000, "Checkpoint every N steps.")
flags.DEFINE_integer("batch", 128, "Train/eval batch size.")
flags.DEFINE_integer("num_train", 4096, "Train images.")
flags.DEFINE_integer("num_test", 256, "Test images (bpd split; repeated 5x "
                     "by the evaluate() protocol).")
flags.DEFINE_bool("tiny", False, "Shrink the model/images for a CPU smoke "
                  "run (protocol unchanged).")
flags.DEFINE_bool("skip_train", False, "Reuse existing numbered checkpoints "
                  "in --workdir and run only the evaluate() bpd stage "
                  "(resume path after an interrupted eval).")


def make_dataset(root: str, size: int = 32, n_train: int = 4096,
                 n_test: int = 256):
  """Same generator as fid_rehearsal_tpu.make_dataset (not imported — the
  two tools' absl flag definitions would collide)."""
  def gen(n, seed):
    r = np.random.default_rng(seed)
    x = r.normal(0.5, 0.2, size=(n, size, size, 3))
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)
  os.makedirs(root, exist_ok=True)
  np.savez(os.path.join(root, "train.npz"), images=gen(n_train, 7))
  np.savez(os.path.join(root, "test.npz"), images=gen(n_test, 8))


def analytic_bpd_bound(mu: float = 127.5, sigma: float = 51.0) -> float:
  """Discrete entropy (bits) of the per-pixel quantized clipped Gaussian.

  Pixels are generated as round/clip of 255 * N(0.5, 0.2^2): bin k collects
  the Gaussian mass of [k, k+1) on the 0..255 lattice, with the tails
  clipped into the boundary bins. Uniform dequantization makes this the
  exact optimal bits/dim of any continuous density model on this data.
  """
  edges = np.arange(257, dtype=np.float64)
  cdf = 0.5 * (1.0 + np.vectorize(math.erf)(
      (edges - mu) / (sigma * math.sqrt(2.0))))
  p = np.diff(cdf)
  p[0] += cdf[0]          # clipped lower tail -> bin 0
  p[-1] += 1.0 - cdf[-1]  # clipped upper tail -> bin 255
  p = p[p > 0]
  return float(-(p * np.log2(p)).sum())


def main(argv):
  from score_sde_pytorch_tpu.utils.platform import sync_platform_from_env
  sync_platform_from_env()
  import jax
  from score_sde_pytorch_tpu import checkpoint as ckpt_lib
  from score_sde_pytorch_tpu import losses, run_lib
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu.configs.subvp.cifar10_ddpmpp_continuous import (
      get_config)

  workdir = FLAGS.workdir
  os.makedirs(workdir, exist_ok=True)
  data_dir = os.path.join(workdir, "data")
  make_dataset(data_dir, size=16 if FLAGS.tiny else 32,
               n_train=FLAGS.num_train, n_test=FLAGS.num_test)

  # The NLL-flagship family (reference configs/subvp/cifar10_ddpmpp_
  # continuous.py; README.md:144 reports 3.02 bits/dim for it).
  config = get_config()
  config.data.dataset = "NPZ"
  config.data.data_dir = data_dir
  config.model.dtype = "bfloat16"
  if FLAGS.tiny:
    config.model.update({"nf": 16, "num_res_blocks": 1, "ch_mult": (1, 2),
                         "attn_resolutions": (8,), "dtype": "float32"})
    config.data.image_size = 16
  config.training.update({
      "batch_size": FLAGS.batch, "n_iters": FLAGS.n_iters,
      "snapshot_freq": FLAGS.snapshot_freq,
      "snapshot_freq_for_preemption": FLAGS.n_iters + 1,
      "eval_freq": FLAGS.n_iters + 1, "log_freq": 200,
      "snapshot_sampling": False, "n_jitted_steps": 10})
  config.eval.update({
      "begin_ckpt": 0, "end_ckpt": FLAGS.n_iters // FLAGS.snapshot_freq,
      "batch_size": FLAGS.batch, "enable_loss": False, "enable_bpd": True,
      "bpd_dataset": "test", "enable_sampling": False})

  if not FLAGS.skip_train:
    # checkpoint_0 = UNTRAINED init: its bpd is the baseline the trained
    # checkpoints must beat (the ODE may legitimately fail to converge on a
    # random score field — the NaN contract — which is itself evidence the
    # non-convergence guard works).
    _, state0 = losses.init_train_state(config,
                                        jax.random.PRNGKey(config.seed))
    ckpt_lib.CheckpointManager(workdir).save_numbered(state0, 0)
    run_lib.train(config, workdir)
  run_lib.evaluate(config, workdir, "eval")

  bound = analytic_bpd_bound()
  traj = {}
  for k in range(0, config.eval.end_ckpt + 1):
    p = os.path.join(workdir, "eval", f"test_ckpt_{k}_bpd.npz")
    with np.load(p) as z:
      v = np.asarray(z["bpd"], np.float64)
    finite = v[np.isfinite(v)]
    traj[k] = {
        "mean_bpd": float(finite.mean()) if finite.size else None,
        "stderr": (float(finite.std(ddof=1) / np.sqrt(finite.size))
                   if finite.size > 1 else None),
        "n_finite": int(finite.size), "n_total": int(v.size),
        "gap_to_bound": (float(finite.mean() - bound) if finite.size
                         else None),
    }
  print(json.dumps({"analytic_bound_bpd": round(bound, 4),
                    "bpd_trajectory": traj}, indent=1))


if __name__ == "__main__":
  app.run(main)
