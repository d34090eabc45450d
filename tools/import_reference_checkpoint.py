"""Import a reference .pth checkpoint into a workdir this framework evals.

One command takes a checkpoint trained by yang-song/score_sde_pytorch
(reference utils.py:22-29 schema: {optimizer, model, ema, step}) and writes
``workdir/checkpoints/checkpoint_<N>`` in our Orbax layout, so

    python tools/import_reference_checkpoint.py --config <leaf.py> \
        --checkpoint /path/checkpoint_24.pth --workdir /path/wd --number 24
    python -m score_sde_pytorch_tpu.main --config <leaf.py> --workdir wd \
        --mode eval --config.eval.begin_ckpt=24 --config.eval.end_ckpt=24

runs the full eval protocol (loss / bpd / FID-IS-KID) directly on reference
weights (VERDICT r3 #4). Both the raw model params and the reference EMA
shadow params are converted — ``evaluate()`` scores EMA params exactly like
the reference does (reference run_lib.py:284 ema.copy_to before eval).

Adam moments are re-initialized (fresh optax state): eval never reads them,
and a training *resume* from an imported checkpoint restarts its second-
moment estimates (documented; the reference's own restore has the same
semantics for our exported checkpoints).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from absl import app, flags, logging
from ml_collections.config_flags import config_flags

FLAGS = flags.FLAGS


def _define_flags():
  """Deferred to script entry: absl flags are process-global, and this
  module is also imported as a library (tests, notebooks) in processes
  where score_sde_pytorch_tpu.main already owns --config/--workdir —
  module-level definitions would raise DuplicateFlagError there."""
  config_flags.DEFINE_config_file("config", None, "Config file.")
  flags.DEFINE_string("checkpoint", None, "Reference .pth checkpoint path.")
  flags.DEFINE_string("workdir", None, "Target workdir.")
  flags.DEFINE_integer("number", -1,
                       "Numbered-checkpoint slot (default: "
                       "step//snapshot_freq from the checkpoint's own step).")
  flags.DEFINE_bool("also_meta", False,
                    "Also write the rolling checkpoints-meta tier so "
                    "--mode train resumes from the imported weights.")
  flags.mark_flags_as_required(["config", "checkpoint", "workdir"])


def import_checkpoint(config, pth_path: str, workdir: str,
                      number: int = -1, also_meta: bool = False) -> int:
  """Convert + write; returns the numbered slot used."""
  import jax
  import torch

  from score_sde_pytorch_tpu import checkpoint as ckpt_lib
  from score_sde_pytorch_tpu import interop, losses
  from score_sde_pytorch_tpu.models import ema as ema_lib
  import score_sde_pytorch_tpu.models  # noqa: F401 (registry)

  ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
  if "model" not in ckpt:
    raise ValueError(
        f"{pth_path} lacks a 'model' entry — not a reference "
        "save_checkpoint file (reference utils.py:22-29)?")
  model_sd = {k: v.detach().cpu().numpy()
              for k, v in ckpt["model"].items()}
  params = interop.torch_state_dict_to_flax(model_sd, config)
  step = int(ckpt.get("step", 0))

  # EMA: the reference stores shadow_params as a LIST in
  # [p for p in model.parameters() if p.requires_grad] order
  # (reference models/ema.py:29); the trainable param-map rows replay
  # exactly that order, so zip them back into a state_dict and convert.
  ema_params = params
  num_updates = step
  ema_ckpt = ckpt.get("ema")
  if isinstance(ema_ckpt, dict) and "shadow_params" in ema_ckpt:
    rows = interop._param_rows(config)
    trainable = [tk for tk, fp, _ in rows
                 if fp not in interop._NON_TRAINABLE_FLAX_PATHS]
    shadow = ema_ckpt["shadow_params"]
    if len(shadow) != len(trainable):
      raise ValueError(
          f"EMA shadow_params length {len(shadow)} != expected trainable "
          f"param count {len(trainable)} for this config")
    # strip any DataParallel prefix from the cleaned keys
    sd_ema = {tk: t.detach().cpu().numpy()
              for tk, t in zip(trainable, shadow)}
    for tk, fp, _ in rows:  # non-trainable params keep the model's value
      if fp in interop._NON_TRAINABLE_FLAX_PATHS:
        key = tk if tk in model_sd else "module." + tk
        sd_ema[tk] = model_sd[key] if key in model_sd else model_sd[tk]
    ema_params = interop.torch_state_dict_to_flax(sd_ema, config)
    num_updates = int(ema_ckpt.get("num_updates", step))
  else:
    logging.warning("checkpoint has no reference-schema EMA; using raw "
                    "model params as EMA")

  # Assemble a full TrainState around the imported weights.
  _, state = losses.init_train_state(config, jax.random.PRNGKey(config.seed))
  import jax.numpy as jnp
  cast = lambda ref: (lambda tpl, v: jnp.asarray(v, tpl.dtype))
  params = jax.tree.map(cast(None), state.params, params)
  ema_params = jax.tree.map(cast(None), state.ema.params, ema_params)
  optimizer = losses.get_optimizer(config)
  state = state.replace(
      step=jnp.asarray(step, jnp.int32),
      params=params,
      opt_state=optimizer.init(params),
      ema=ema_lib.EMAState(decay=float(config.model.ema_rate),
                           params=ema_params,
                           num_updates=jnp.asarray(num_updates, jnp.int32)))

  if number < 0:
    freq = config.training.snapshot_freq
    number = max(1, step // freq) if freq else 1
  mgr = ckpt_lib.CheckpointManager(workdir)
  mgr.save_numbered(state, number)
  if also_meta:
    mgr.save_meta(state)
  logging.info("imported %s (step %d) -> %s/checkpoints/checkpoint_%d",
               pth_path, step, workdir, number)
  logging.info(
      "next: `python -m score_sde_pytorch_tpu.main --config <same> "
      "--workdir %s --mode sample` to generate images, or --mode eval "
      "for the loss/bpd/FID stages.", workdir)
  return number


def main(argv):
  from score_sde_pytorch_tpu.utils.platform import sync_platform_from_env
  sync_platform_from_env()
  import_checkpoint(FLAGS.config, FLAGS.checkpoint, FLAGS.workdir,
                    FLAGS.number, FLAGS.also_meta)


if __name__ == "__main__":
  _define_flags()
  app.run(main)
