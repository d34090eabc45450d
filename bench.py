"""Benchmark: PC-sampling throughput of the flagship CIFAR-10 NCSN++ model.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the PyTorch reference trains at
0.56 s/step on 4×V100 for batch 128; for sampling, the paper's PC sampler is
N=1000 model evals × 2 (corrector) per batch. The reference has no published
samples/sec; we derive the 4×V100 sampling throughput from its training
fwd+bwd time: fwd ≈ 1/3 of fwd+bwd → one model eval for batch 128 ≈
0.56/3 s on 4 chips → per-chip samples/sec for a full 2000-NFE PC chain:
128 / (2000 * 0.56/3) / 4 ≈ 0.0857. vs_baseline = ours / 0.0857.
"""
import json
import time

BASELINE_SAMPLES_PER_SEC_PER_CHIP = 128.0 / (2000 * 0.56 / 3) / 4  # ≈ 0.0857


def main():
  import jax
  import jax.numpy as jnp
  from score_sde_pytorch_tpu import sampling, sde as sde_lib
  from score_sde_pytorch_tpu.models import utils as mutils
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  config = get_config()
  # bf16 inference: the TPU-native serving precision (params stay fp32,
  # norms/softmax fp32 — see models/layerspp.py). Training default is fp32.
  config.model.dtype = "bfloat16"

  on_accelerator = jax.devices()[0].platform != "cpu"
  if not on_accelerator:
    # CPU fallback (driver sanity runs): shrink hard so the bench completes;
    # the metric is only meaningful on TPU.
    config.model.num_scales = 10
    config.model.nf = 32
    config.model.num_res_blocks = 2
    config.model.dtype = "float32"
  sde = sde_lib.build_sde(config)

  batch = 64 if on_accelerator else 4
  shape = (batch, 32, 32, 3)
  model_def, variables = mutils.create_model(config, jax.random.PRNGKey(0))
  params = variables["params"]

  predictor = sampling.get_predictor(config.sampling.predictor)
  corrector = sampling.get_corrector(config.sampling.corrector)
  sampler = sampling.get_pc_sampler(
      sde, model_def, shape, predictor, corrector, lambda x: x,
      snr=config.sampling.snr, n_steps=config.sampling.n_steps_each,
      probability_flow=False, continuous=True, denoise=True)

  import numpy as np
  rng = jax.random.PRNGKey(0)
  # Warmup/compile. NOTE: completion is forced with a host fetch —
  # block_until_ready does not reliably block on relayed TPU backends.
  samples, nfe = sampler(rng, params)
  np.asarray(samples)

  n_rounds = 2 if on_accelerator else 1
  t0 = time.time()
  for i in range(n_rounds):
    samples, nfe = sampler(jax.random.fold_in(rng, i), params)
    np.asarray(samples)
  dt = time.time() - t0

  n_chips = jax.device_count()
  samples_per_sec_per_chip = batch * n_rounds / dt / n_chips
  print(json.dumps({
      "metric": "samples/sec/chip (NCSN++ cont. VE PC sampling, CIFAR-10)",
      "value": round(samples_per_sec_per_chip, 4),
      "unit": "samples/s/chip",
      "vs_baseline": round(
          samples_per_sec_per_chip / BASELINE_SAMPLES_PER_SEC_PER_CHIP, 3),
  }))


if __name__ == "__main__":
  main()
