"""Compute FID reference statistics for a dataset → assets/stats/*.npz.

Equivalent of the pre-computed stats the reference ships in assets/stats/
(reference evaluation.py:43-56). Requires Inception weights
(INCEPTION_WEIGHTS_NPZ).

    python tools/compute_dataset_stats.py --config <cfg.py> \
        [--split train] [--out assets/stats]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from absl import app, flags
from ml_collections.config_flags import config_flags

FLAGS = flags.FLAGS
config_flags.DEFINE_config_file("config", None, "Config file.")
flags.DEFINE_string("split", "train", "Dataset split.")
flags.DEFINE_string("out", "assets/stats", "Output directory.")
flags.DEFINE_integer("max_examples", 0,
                     "Cap the number of images (0 = full split).")
flags.mark_flags_as_required(["config"])


def main(argv):
  from score_sde_pytorch_tpu import datasets, evaluation
  from score_sde_pytorch_tpu.utils.platform import sync_platform_from_env

  sync_platform_from_env()

  config = FLAGS.config
  images = datasets.materialize(datasets.load_raw_dataset(config, FLAGS.split))
  if FLAGS.max_examples:
    images = images[:FLAGS.max_examples]
  stats = evaluation.run_inception(images, config)
  if stats is None:
    raise SystemExit("Inception weights unavailable "
                     "(set INCEPTION_WEIGHTS_NPZ)")
  pool = stats["pool_3"]
  mu = pool.mean(axis=0)
  sigma = np.cov(pool, rowvar=False)
  os.makedirs(FLAGS.out, exist_ok=True)
  name = config.data.dataset.lower()
  out = os.path.join(FLAGS.out,
                     f"{name}_{config.data.image_size}_stats.npz")
  np.savez_compressed(out, mu=mu, sigma=sigma, pool_3=pool)
  print(f"wrote {out}: pool {pool.shape}")


if __name__ == "__main__":
  app.run(main)
