"""Interactive debug harness.

Rebuild of /root/reference/debug.py:36-49: load a checkpoint, run one
forward/score evaluation with a breakpoint-able entry point. Usage:

    python -m score_sde_pytorch_tpu.debug --config <cfg.py> --workdir <dir> \
        [--ckpt N]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from absl import app, flags
from ml_collections.config_flags import config_flags

FLAGS = flags.FLAGS
config_flags.DEFINE_config_file("config", None, "Config file.")
flags.DEFINE_string("workdir", None, "Work directory with checkpoints.")
flags.DEFINE_integer("ckpt", -1, "Numbered checkpoint to load (-1 = meta).")
flags.mark_flags_as_required(["config", "workdir"])


def main(argv):
  from score_sde_pytorch_tpu import checkpoint as ckpt_lib
  from score_sde_pytorch_tpu import losses, sde as sde_lib
  from score_sde_pytorch_tpu.models import utils as mutils
  import score_sde_pytorch_tpu.models  # noqa: F401

  config = FLAGS.config
  model_def, state = losses.init_train_state(config, jax.random.PRNGKey(0))
  mgr = ckpt_lib.CheckpointManager(FLAGS.workdir)
  if FLAGS.ckpt >= 0:
    state = mgr.restore_numbered(state, FLAGS.ckpt)
  else:
    state = mgr.restore_meta(state)
  print(f"loaded state at step {int(state.step)}")

  sde = sde_lib.build_sde(config)
  score_fn = mutils.get_score_fn(sde, model_def, state.ema.params,
                                 train=False,
                                 continuous=config.training.continuous)
  x = jax.random.normal(
      jax.random.PRNGKey(1),
      (4, config.data.image_size, config.data.image_size,
       config.data.num_channels))
  t = jnp.full((4,), 0.5)
  score = score_fn(x, t)
  print("score stats:", float(score.mean()), float(score.std()))
  breakpoint()  # inspect `state`, `score_fn`, `sde` interactively


if __name__ == "__main__":
  app.run(main)
