"""FID evidence-chain rehearsal on TPU (VERDICT r3 #4).

Zero-egress blocks the real CIFAR-10 + Inception weights, so this rehearses
the ENTIRE quality loop end-to-end with drop-in substitutes and shows the
score behaves like a quality metric — FID(trained) << FID(untrained),
decreasing across checkpoints — through the ACTUAL ``run_lib.evaluate()``
sampling stage (reference run_lib.py:330-408), not through side tools:

  1. dataset: NPZ of Gaussian-pixel images N(0.5, 0.2^2) — the task the
     flagship learning proof already pins (tools/learning_proof_tpu.py:
     learned score ≤8% rel-L2 of the closed form, sample moments to 3
     decimals).
  2. feature net: the real InceptionV3Features architecture with
     deterministic random weights (a frozen random feature net — rich
     enough that distribution mismatch moves the Fréchet distance).
  3. dataset stats via evaluation.run_inception (same code path the real
     stats tool uses).
  4. checkpoint_0 = untrained init; train the REAL flagship config
     (CIFAR-10 NCSN++ cont. VE, bf16, batch 128, rbg) for --n_iters with
     snapshots every --snapshot_freq.
  5. run_lib.evaluate() over ckpts 0..K with the full N=1000 PC chain →
     report_k.npz each.

Swap in the real CIFAR-10 npz + converted TF-Hub Inception weights
(tools/convert_inception_weights.py) and the SAME command computes the real
paper FID.

    python tools/fid_rehearsal_tpu.py --workdir /tmp/fid_rehearsal \
        [--n_iters 3000] [--snapshot_freq 1000] [--num_samples 512]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("workdir", "/tmp/fid_rehearsal", "Working directory.")
flags.DEFINE_integer("n_iters", 3000, "Training steps.")
flags.DEFINE_integer("snapshot_freq", 1000, "Checkpoint every N steps.")
flags.DEFINE_integer("num_samples", 512, "Samples per checkpoint for FID.")
flags.DEFINE_integer("batch", 128, "Train/eval batch size.")
flags.DEFINE_integer("num_scales", 1000, "PC chain length (reference 1000).")


def make_dataset(root: str, size: int = 32, n_train: int = 4096,
                 n_test: int = 512):
  rng = np.random.default_rng(7)
  def gen(n, seed):
    r = np.random.default_rng(seed)
    x = r.normal(0.5, 0.2, size=(n, size, size, 3))
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)
  os.makedirs(root, exist_ok=True)
  np.savez(os.path.join(root, "train.npz"), images=gen(n_train, 7))
  np.savez(os.path.join(root, "test.npz"), images=gen(n_test, 8))
  del rng


def make_inception_weights(path: str):
  """Frozen random feature net: He-initialized InceptionV3.

  He gain (std = sqrt(2/fan_in)) is REQUIRED, not cosmetic: with
  1/sqrt(fan_in) the ReLU halving compounds over the ~94 conv layers and
  pool features collapse to ~1e-4 scale (covariance ~1e-10) — FID between
  ANY two distributions reads ~0 and the rehearsal discriminates nothing
  (measured: first TPU run returned fid=2.6e-4 for an UNTRAINED model).
  With He init the same net gives pool std ~0.39, same-distribution FID
  0.13 vs cross-distribution FID 88.2 (CPU calibration, n=128/side).
  """
  from score_sde_pytorch_tpu import inception
  rng = np.random.default_rng(0)
  raw = {}
  for name, kh, kw, cin, cout in inception.weight_spec():
    raw[f"{name}.conv.weight"] = rng.normal(
        0, np.sqrt(2.0 / (kh * kw * cin)),
        (cout, cin, kh, kw)).astype(np.float32)
    raw[f"{name}.bn.weight"] = np.ones(cout, np.float32)
    raw[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
    raw[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
    raw[f"{name}.bn.running_var"] = np.ones(cout, np.float32)
  raw["fc.weight"] = rng.normal(0, 0.05, (1008, 2048)).astype(np.float32)
  raw["fc.bias"] = np.zeros(1008, np.float32)
  np.savez(path, **raw)


def main(argv):
  from score_sde_pytorch_tpu.utils.platform import sync_platform_from_env
  sync_platform_from_env()
  import jax
  from score_sde_pytorch_tpu import checkpoint as ckpt_lib
  from score_sde_pytorch_tpu import datasets, evaluation, losses, run_lib
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  workdir = FLAGS.workdir
  os.makedirs(workdir, exist_ok=True)
  data_dir = os.path.join(workdir, "data")
  make_dataset(data_dir)
  wpath = os.path.join(workdir, "inception_random.npz")
  make_inception_weights(wpath)
  os.environ["INCEPTION_WEIGHTS_NPZ"] = wpath

  config = get_config()
  config.data.dataset = "NPZ"
  config.data.data_dir = data_dir
  config.model.dtype = "bfloat16"
  config.model.num_scales = FLAGS.num_scales
  config.training.update({
      "batch_size": FLAGS.batch, "n_iters": FLAGS.n_iters,
      "snapshot_freq": FLAGS.snapshot_freq,
      "snapshot_freq_for_preemption": FLAGS.n_iters + 1,
      "eval_freq": FLAGS.n_iters + 1, "log_freq": 200,
      "snapshot_sampling": False, "n_jitted_steps": 10})
  config.eval.update({
      "begin_ckpt": 0, "end_ckpt": FLAGS.n_iters // FLAGS.snapshot_freq,
      "batch_size": FLAGS.batch, "enable_loss": False, "enable_bpd": False,
      "enable_sampling": True, "num_samples": FLAGS.num_samples})

  # Dataset stats through the same Inception path evaluate() scores with.
  train_imgs = datasets.materialize(
      datasets.load_raw_dataset(config, "train"))
  stats = evaluation.run_inception(train_imgs, config)
  assert stats is not None
  pool = stats["pool_3"]
  stats_dir = os.path.join(workdir, "assets", "stats")
  os.makedirs(stats_dir, exist_ok=True)
  np.savez(os.path.join(stats_dir, "npz_32_stats.npz"),
           mu=pool.mean(axis=0), sigma=np.cov(pool, rowvar=False))
  os.chdir(workdir)  # evaluation.load_dataset_stats reads assets/stats/

  # checkpoint_0 = UNTRAINED init (the FID baseline the trained ckpts beat).
  _, state0 = losses.init_train_state(config, jax.random.PRNGKey(config.seed))
  ckpt_lib.CheckpointManager(workdir).save_numbered(state0, 0)

  run_lib.train(config, workdir)
  run_lib.evaluate(config, workdir, "eval")

  traj = {}
  for k in range(0, config.eval.end_ckpt + 1):
    p = os.path.join(workdir, "eval", f"report_{k}.npz")
    with np.load(p) as z:
      traj[k] = {key: float(z[key]) for key in z.files}
  print(json.dumps({"fid_trajectory": traj}, indent=1))


if __name__ == "__main__":
  app.run(main)
