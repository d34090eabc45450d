"""Demo: PC sampling, probability-flow ODE, likelihood, and controllable
generation — the script equivalent of the reference's
Score_SDE_demo_PyTorch.ipynb (headings mirrored as sections).

Runs end-to-end on CPU or TPU with a freshly-initialized tiny model (swap in
a trained checkpoint via --workdir for real samples).

    python examples/demo.py [--workdir runs/my_run] [--ckpt 12]
"""
import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--workdir", default="")
  parser.add_argument("--ckpt", type=int, default=-1)
  parser.add_argument("--out", default="demo_out")
  parser.add_argument("--tiny", action="store_true",
                      help="shrink the model/shapes hard (smoke tests / "
                           "1-core CI; samples are noise)")
  args = parser.parse_args()

  from score_sde_pytorch_tpu import (controllable_generation as cg, datasets,
                                     likelihood as likelihood_lib, losses,
                                     sampling, sde as sde_lib)
  from score_sde_pytorch_tpu.models import utils as mutils  # noqa: F401
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)
  from score_sde_pytorch_tpu.utils.image import make_grid, save_image

  os.makedirs(args.out, exist_ok=True)
  config = get_config()
  if not args.workdir:
    # Tiny model so the demo runs quickly without a checkpoint.
    config.model.nf = 32
    config.model.num_res_blocks = 2
    config.model.num_scales = 100
  if args.tiny:
    config.model.update({"nf": 8, "num_res_blocks": 1, "ch_mult": (1, 2),
                         "attn_resolutions": (8,), "num_scales": 8})
    config.data.image_size = 16

  rng = jax.random.PRNGKey(0)
  model_def, state = losses.init_train_state(config, rng)
  if args.workdir:
    from score_sde_pytorch_tpu import checkpoint as ckpt_lib
    mgr = ckpt_lib.CheckpointManager(args.workdir)
    state = (mgr.restore_numbered(state, args.ckpt) if args.ckpt >= 0
             else mgr.restore_meta(state))
    print(f"restored step {int(state.step)}")
  params = state.ema.params

  sde = sde_lib.build_sde(config)
  inverse_scaler = datasets.get_data_inverse_scaler(config)
  shape = (16, config.data.image_size, config.data.image_size, 3)

  # --- Predictor-Corrector sampling ---
  sampler = sampling.get_pc_sampler(
      sde, model_def, shape, sampling.get_predictor("reverse_diffusion"),
      sampling.get_corrector("langevin"), inverse_scaler, snr=0.16,
      continuous=True)
  samples, nfe = sampler(jax.random.PRNGKey(1), params)
  print(f"PC sampling: {int(nfe)} network evaluations")
  save_image(make_grid(np.clip(np.asarray(samples), 0, 1), 4),
             os.path.join(args.out, "pc_samples.png"))

  # --- Probability flow ODE ---
  ode_sampler = sampling.get_ode_sampler(sde, model_def, shape,
                                         inverse_scaler, denoise=True)
  ode_samples, nfe = ode_sampler(jax.random.PRNGKey(2), params)
  print(f"ODE sampling: {int(nfe)} network evaluations")
  save_image(make_grid(np.clip(np.asarray(ode_samples), 0, 1), 4),
             os.path.join(args.out, "ode_samples.png"))

  # --- DPM-Solver++(2M) fast sampling (beyond-reference; 1 NFE/step) ---
  dpmpp_sampler = sampling.get_dpmpp_sampler(sde, model_def, shape,
                                             inverse_scaler, n_steps=20,
                                             denoise=True, continuous=True)
  dpmpp_samples, nfe = dpmpp_sampler(jax.random.PRNGKey(9), params)
  print(f"dpmpp sampling: {int(nfe)} network evaluations")
  save_image(make_grid(np.clip(np.asarray(dpmpp_samples), 0, 1), 4),
             os.path.join(args.out, "dpmpp_samples.png"))

  # --- Likelihood (bits/dim) ---
  likelihood_fn = likelihood_lib.get_likelihood_fn(sde, model_def,
                                                   inverse_scaler)
  data = jax.random.uniform(jax.random.PRNGKey(3), (4,) + shape[1:])
  scaler = datasets.get_data_scaler(config)
  bpd, z, nfe = likelihood_fn(jax.random.PRNGKey(4), params, scaler(data))
  print(f"bits/dim: {np.asarray(bpd)} ({int(nfe)} NFE)")

  # --- Controllable generation: inpainting ---
  inpainter = cg.get_pc_inpainter(
      sde, model_def, sampling.get_predictor("reverse_diffusion"),
      sampling.get_corrector("langevin"), inverse_scaler, snr=0.16,
      continuous=True)
  img = jnp.broadcast_to(data[:1], (4,) + shape[1:])
  mask = jnp.ones_like(img).at[:, :, shape[2] // 2:, :].set(0.0)
  inpainted = inpainter(jax.random.PRNGKey(5), params, scaler(img), mask)
  save_image(make_grid(np.clip(np.asarray(inpainted), 0, 1), 2),
             os.path.join(args.out, "inpainted.png"))

  # --- Controllable generation: colorization ---
  gray = jnp.tile(jnp.mean(img, axis=-1, keepdims=True), (1, 1, 1, 3))
  colorizer = cg.get_pc_colorizer(
      sde, model_def, sampling.get_predictor("reverse_diffusion"),
      sampling.get_corrector("langevin"), inverse_scaler, snr=0.16,
      continuous=True)
  colorized = colorizer(jax.random.PRNGKey(6), params, scaler(gray))
  save_image(make_grid(np.clip(np.asarray(colorized), 0, 1), 2),
             os.path.join(args.out, "colorized.png"))
  print(f"wrote demo outputs to {args.out}/")


if __name__ == "__main__":
  main()
