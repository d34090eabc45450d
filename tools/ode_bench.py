"""Measure the on-device probability-flow ODE paths on TPU.

Times (a) the ODE sampler and (b) the bits/dim likelihood for the flagship
CIFAR-10 NCSN++ (cont. VE becomes VP for likelihood-style runs — we bench
the shipped subVP DDPM++ likelihood config axis too) and reports NFE and
wall time. The reference pays 2 host<->device copies per NFE through scipy
(reference sampling.py:466-470, likelihood.py:99); here the whole adaptive
RK45 runs inside one jit, so the per-NFE cost is a model eval.

    python tools/ode_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _force(x):
  import jax
  return np.asarray(jax.tree_util.tree_leaves(x)[0])


def main():
  import jax
  import jax.numpy as jnp
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu import likelihood, sampling, sde as sde_lib
  from score_sde_pytorch_tpu.models import utils as mutils
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  on_accel = jax.devices()[0].platform != "cpu"
  config = get_config()
  config.model.dtype = "bfloat16" if on_accel else "float32"
  if not on_accel:  # smoke only — adaptive RK45 does O(100) NFE
    config.model.nf = 8
    config.model.num_res_blocks = 1
    config.model.ch_mult = (1, 2)
    config.model.attn_resolutions = (8,)
    config.data.image_size = 16
  batch = 16 if on_accel else 2
  size = config.data.image_size
  shape = (batch, size, size, 3)
  sde = sde_lib.build_sde(config)
  model_def, variables = mutils.create_model(config, jax.random.PRNGKey(0))
  params = variables["params"]
  rng = jax.random.PRNGKey(0)
  out = {"batch": batch, "platform": jax.devices()[0].platform}

  # (a) ODE sampler (rtol=atol=1e-5 like reference sampling.py:425)
  sampler = sampling.get_ode_sampler(
      sde, model_def, shape, lambda x: x, denoise=True,
      rtol=config.sampling.rtol, atol=config.sampling.atol,
      eps=sde_lib.sampling_eps(config))
  x, nfe = sampler(rng, params)
  _force(x)
  t0 = time.time()
  x, nfe = sampler(jax.random.fold_in(rng, 1), params)
  _force(x)
  out["ode_sample_s"] = round(time.time() - t0, 3)
  out["ode_sample_nfe"] = int(np.asarray(nfe).max())
  # NOTE: a random-init model's prob-flow drift is nearly linear, so the
  # adaptive solver needs very few steps (trained models take O(100-300)
  # NFE at these tolerances). The transferable metric is the per-NFE cost:
  # one on-device model eval, vs the reference's model eval + 2 host<->device
  # copies through scipy per NFE (reference sampling.py:466-470).
  out["ode_ms_per_nfe"] = round(
      out["ode_sample_s"] * 1e3 / out["ode_sample_nfe"], 2)

  # (b) bits/dim likelihood (Rademacher Hutchinson, reference likelihood.py)
  lik = likelihood.get_likelihood_fn(sde, model_def, lambda x: (x + 1) / 2)
  data = jax.random.uniform(rng, shape, minval=-1.0, maxval=1.0)
  bpd, _, nfe = lik(rng, params, data)
  _force(bpd)
  t0 = time.time()
  bpd, _, nfe = lik(jax.random.fold_in(rng, 2), params, data)
  _force(bpd)
  out["bpd_s"] = round(time.time() - t0, 3)
  out["bpd_nfe"] = int(np.asarray(nfe).max())
  out["bpd_ms_per_nfe"] = round(out["bpd_s"] * 1e3 / out["bpd_nfe"], 2)

  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
