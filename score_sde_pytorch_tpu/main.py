"""CLI entry point.

Rebuild of /root/reference/main.py: same absl flags surface
(--config --workdir --mode --eval_folder), dual console+file logging to
workdir/stdout.txt, dispatch to run_lib.
"""
from __future__ import annotations

import logging
import os
import sys

from absl import app, flags
from ml_collections.config_flags import config_flags

FLAGS = flags.FLAGS

config_flags.DEFINE_config_file(
    "config", None, "Training configuration.", lock_config=True)
flags.DEFINE_string("workdir", None, "Work directory.")
flags.DEFINE_enum("mode", None, ["train", "eval", "sample"],
                  "Running mode: train, eval, or sample (standalone "
                  "generation from a checkpoint — no dataset/Inception "
                  "needed; the reference only exposes this via its demo "
                  "notebook)")
flags.DEFINE_string("eval_folder", "eval",
                    "The folder name for storing evaluation results")
flags.DEFINE_string("sample_folder", "generated",
                    "Folder name (under workdir) for --mode sample outputs")
flags.DEFINE_integer("checkpoint", -1,
                     "Numbered checkpoint for --mode sample; -1 = latest "
                     "(falls back to the rolling meta checkpoint)")
flags.DEFINE_integer("num_samples", 0,
                     "Total images for --mode sample; 0 = one eval batch")
flags.DEFINE_bool("multihost", False,
                  "Initialize jax.distributed (multi-host TPU pods; "
                  "coordinator discovered from the TPU environment unless "
                  "--coordinator_address/--num_processes/--process_id are "
                  "given explicitly).")
flags.DEFINE_string("coordinator_address", "",
                    "host:port of process 0's jax.distributed coordinator "
                    "(explicit multi-process setup, e.g. CPU pods or "
                    "manual clusters).")
flags.DEFINE_integer("num_processes", -1,
                     "Total process count for explicit multi-process setup.")
flags.DEFINE_integer("process_id", -1,
                     "This process's id for explicit multi-process setup.")
flags.DEFINE_string("platform", "",
                    "Force a JAX platform (e.g. 'cpu'). Overrides any "
                    "site-level jax_platforms setting.")
flags.DEFINE_string("compilation_cache_dir", "",
                    "Persist XLA executables here (jax compilation cache): "
                    "the 20-40s+ first-jit cost of the big train/sampler "
                    "scans is paid once per (program, config), not per run. "
                    "Shared across train/eval and across restarts.")
flags.mark_flags_as_required(["workdir", "config", "mode"])


def main(argv):
  if FLAGS.platform:
    import jax
    jax.config.update("jax_platforms", FLAGS.platform)
  if FLAGS.compilation_cache_dir:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      FLAGS.compilation_cache_dir)
    # Cache every compile, however small/fast (defaults skip sub-second
    # compiles, which covers the tiny eval helpers around the main scans).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
  if FLAGS.multihost:
    import jax
    if FLAGS.coordinator_address:
      jax.distributed.initialize(
          coordinator_address=FLAGS.coordinator_address,
          num_processes=FLAGS.num_processes,
          process_id=FLAGS.process_id)
    else:
      jax.distributed.initialize()

  from score_sde_pytorch_tpu import run_lib
  from score_sde_pytorch_tpu.utils import io as io_utils

  io_utils.makedirs(FLAGS.workdir)
  # Dual console + file logging (reference main.py:40-49); the file side
  # goes through gfile so gs:// workdirs work (reference main.py:43).
  handler = logging.StreamHandler(sys.stdout)
  log_path = os.path.join(FLAGS.workdir, "stdout.txt")
  if "://" in log_path:
    file_handler = logging.StreamHandler(io_utils.open_file(log_path, "w"))
  else:
    file_handler = logging.FileHandler(log_path)
  formatter = logging.Formatter(
      "%(levelname)s - %(filename)s - %(asctime)s - %(message)s")
  for h in (handler, file_handler):
    h.setFormatter(formatter)
  logger = logging.getLogger()
  logger.addHandler(handler)
  logger.addHandler(file_handler)
  logger.setLevel("INFO")

  if FLAGS.mode == "train":
    run_lib.train(FLAGS.config, FLAGS.workdir)
  elif FLAGS.mode == "eval":
    run_lib.evaluate(FLAGS.config, FLAGS.workdir, FLAGS.eval_folder)
  elif FLAGS.mode == "sample":
    run_lib.sample(FLAGS.config, FLAGS.workdir, FLAGS.sample_folder,
                   checkpoint=FLAGS.checkpoint,
                   num_samples=FLAGS.num_samples)
  else:
    raise ValueError(f"Mode {FLAGS.mode} not recognized.")


if __name__ == "__main__":
  app.run(main)
