"""Benchmark: flagship CIFAR-10 NCSN++ (cont. VE) — sampling + training.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}.

Driver-proofing (VERDICT r4 #1 — BENCH_r04 timed out with the JSON never
printed): the headline sampling number is measured FIRST; every other row
is optional, gated on the remaining wall-clock budget (``BENCH_BUDGET_S``,
default 1500 s), and skipped rows are recorded in ``extra.skipped_rows``.
A watchdog thread emits the JSON line with whatever has been measured and
exits 0 if the budget expires mid-stage (e.g. a slow 256px compile), so the
artifact parses even when a stage hangs.

Headline metric: PC-sampling throughput (samples/s/chip, batch 64, bf16
inference, N=1000 predictor + 1 corrector step = 2000 NFE), matching the
reference's paper sampler (reference sampling.py:355-411). Batch 64 was
A/B-measured against 128 on v5e (3.63 vs 3.18 samples/s/chip) — the larger
batch's working set trips out of the fast regime for the scanned sampler.

Baselines (BASELINE.md / reference README.md:64-69 — all 4x V100 32GB,
batch 128):
  * training (MEASURED by the reference authors): 0.56 s/step torch,
    i.e. 128 / 0.56 / 4 = 57.14 imgs/s/chip. `extra.train_vs_baseline`
    is measured-vs-measured against this number; the numerator's basis is
    recorded in `extra.train_throughput_basis` (the marginal device cost —
    which the pipelined CLI loop achieves wall-clock, tools/
    train_wall_bench.py — when available, else best measured wall).
  * sampling (DERIVED — the reference publishes no samples/s): one model
    eval ~ fwd ~ (fwd+bwd)/3 = 0.56/3 s for batch 128 on 4 chips, so a
    2000-NFE PC chain yields 128 / (2000*0.56/3) / 4 = 0.0857
    samples/s/chip. The headline `vs_baseline` uses this; it is soft,
    which is why `extra.train_vs_baseline` (hard) is also reported.

extra: train step_ms for fp32 x n_jitted {1,5} and bf16 x n_jitted
{1,5,10} (config default prng_impl='rbg' — hardware RngBitGenerator,
measured 22% over threefry, tools/train_ablation2.py), MFU of the bf16
train step from XLA-compiled FLOPs vs the chip's bf16 peak.
"""
import json
import time

BASELINE_SAMPLES_PER_SEC_PER_CHIP = 128.0 / (2000 * 0.56 / 3) / 4  # ~0.0857
BASELINE_TRAIN_IMGS_PER_SEC_PER_CHIP = 128.0 / 0.56 / 4            # 57.14

# bf16 peak FLOP/s per chip by device kind (public spec sheets).
# NOTE v5e ("v5 lite"): 197 TFLOP/s bf16 — the oft-quoted 394 is the INT8
# TOPS figure. Rounds 2-3 used 394 here, understating every reported MFU
# by exactly 2x (r3's "31.5% MFU / convs at 40-50% MXU" is really 63% /
# 80-100% — consistent with every buy-back experiment failing to move it:
# the convs were already near the bf16 roof).
_PEAK_BF16 = {
    "v6e": 918e12, "v6": 918e12,
    "v5e": 197e12, "v5lite": 197e12, "v5p": 459e12,
    "v4": 275e12, "v3": 123e12, "v2": 45e12,
}


def _peak_flops(device):
  kind = getattr(device, "device_kind", "").lower().replace(" ", "")
  for key, peak in _PEAK_BF16.items():
    if key in kind:
      return peak, key
  return 197e12, "assumed-v5e"


def _force(x):
  # Completion is forced with a host fetch — block_until_ready does not
  # reliably block on relayed TPU backends.
  import numpy as np
  import jax
  return np.asarray(jax.tree_util.tree_leaves(x)[0])


def _median_ms(fn, args_fn, rounds):
  import numpy as np
  ts = []
  for i in range(rounds):
    args = args_fn(i)
    t0 = time.time()
    _force(fn(*args))
    ts.append((time.time() - t0) * 1e3)
  return float(np.median(ts))


def _flops_of(compiled):
  """FLOPs from XLA cost_analysis (the scanned BODY = one step), 0.0 if
  the backend doesn't report them."""
  try:
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
      cost = cost[0]
    return float(cost.get("flops", 0.0))
  except Exception:
    return 0.0


def timed_train_scan_ms(config, batch, n_steps, rounds, with_flops=False,
                        compiler_options=None):
  """Median wall ms of ONE jitted n-step train-scan call (fresh state, one
  warmup call, donated state buffers). Returns (median_ms, flops).

  This is THE marginal-cost timing harness — shared by bench_model_zoo and
  tools/{remat_policy_bench,flash_e2e,mfu_experiments} so method fixes
  (like the round-3 device-time MFU correction) land once, not in four
  drifting copies.

  compiler_options: dict of XLA option-name -> string value passed to
  ``lowered.compile(compiler_options=...)``. On relayed TPU backends this
  is the ONLY way to sweep TPU compiler flags — client-side XLA_FLAGS with
  TPU-only names fatals in parse_flags_from_env (the client binary is CPU
  XLA), while compiler_options travel with the computation to the server.
  """
  import jax
  import jax.numpy as jnp
  import numpy as np
  from score_sde_pytorch_tpu import losses, sde as sde_lib

  size = config.data.image_size
  sde = sde_lib.build_sde(config)
  optimizer = losses.get_optimizer(config)
  model_def, state = losses.init_train_state(config, jax.random.PRNGKey(0))
  fn = jax.jit(
      losses.get_n_step_fn(
          sde, model_def, train=True, optimizer=optimizer, n_steps=n_steps,
          reduce_mean=config.training.get("reduce_mean", False),
          continuous=config.training.continuous,
          prng_impl=config.training.get("prng_impl")),
      donate_argnums=0)
  batches = jnp.zeros((n_steps, batch, size, size, 3), jnp.float32)
  lowered = fn.lower(state, batches)
  compiled = (lowered.compile(compiler_options=compiler_options)
              if compiler_options else lowered.compile())
  flops = _flops_of(compiled) if with_flops else 0.0
  state, _ = compiled(state, batches)
  _force(state.step)
  ts = []
  for _ in range(rounds):
    batches = jnp.zeros((n_steps, batch, size, size, 3), jnp.float32)
    t0 = time.time()
    state, _ = compiled(state, batches)
    _force(state.step)
    ts.append((time.time() - t0) * 1e3)
  return float(np.median(ts)), flops


def marginal_train_step_ms(config, batch, n_lo, n_hi, rounds,
                           with_flops=False, compiler_options=None):
  """Per-step marginal cost between n_lo- and n_hi-step executables —
  equals the profiler's device time on relayed backends (the j1 wall
  includes ~40-60 ms of tunnel dispatch). Returns (ms, flops_per_step)."""
  t_lo, f_lo = timed_train_scan_ms(config, batch, n_lo, rounds, with_flops,
                                   compiler_options)
  t_hi, f_hi = timed_train_scan_ms(config, batch, n_hi, rounds, with_flops,
                                   compiler_options)
  per_step = (t_hi - t_lo) / (n_hi - n_lo)
  # cost_analysis reports the scanned BODY (one step) — measured identical
  # for n=2 and n=12 executables; fall back to the marginal if they differ.
  flops = f_hi if f_hi == f_lo else (f_hi - f_lo) / (n_hi - n_lo)
  return per_step, flops


def bench_train(config, on_accelerator):
  """Measured train-step times + MFU. Returns (extra_dict)."""
  import jax
  import jax.numpy as jnp
  from score_sde_pytorch_tpu import losses, sde as sde_lib

  batch = 128 if on_accelerator else 4
  size = config.data.image_size
  out = {}
  mfu = None
  for dtype in (["float32", "bfloat16"] if on_accelerator else ["float32"]):
    config.model.dtype = dtype
    sde = sde_lib.build_sde(config)
    model_def, state = losses.init_train_state(config, jax.random.PRNGKey(0))
    optimizer = losses.get_optimizer(config)
    tag = {"float32": "fp32", "bfloat16": "bf16"}[dtype]
    # fp32 keeps only the j1 reference point: the bf16 grid already carries
    # the scan-fusion story, and dropping the fp32 j5 compile buys the
    # budget room that lets the model_zoo stage fit under BENCH_BUDGET_S
    # (the r5 live run skipped it at 305 s remaining vs a 420 s estimate).
    n_jitted_grid = [1] if not on_accelerator else (
        [1, 5, 10] if dtype == "bfloat16" else [1])
    for n_jitted in n_jitted_grid:
      n_step = jax.jit(
          losses.get_n_step_fn(sde, model_def, train=True,
                               optimizer=optimizer, n_steps=n_jitted,
                               reduce_mean=config.training.reduce_mean,
                               continuous=config.training.continuous,
                               likelihood_weighting=False,
                               prng_impl=config.training.get("prng_impl")),
          donate_argnums=0)
      batches = jnp.zeros((n_jitted, batch, size, size, 3), jnp.float32)
      if dtype == "bfloat16" and n_jitted == 1:
        mfu_flops = _flops_of(n_step.lower(state, batches).compile())
      state, _ = n_step(state, batches)        # compile + warmup
      _force(state.step)
      rounds = 5 if n_jitted == 1 else 3
      import numpy as np
      ts = []
      for _ in range(rounds):
        t0 = time.time()
        state, _ = n_step(state, batches)
        _force(state.step)
        ts.append((time.time() - t0) * 1e3)
      t_ms = float(np.median(ts)) / n_jitted
      out[f"train_step_ms_{tag}_j{n_jitted}"] = round(t_ms, 2)
    if dtype == "bfloat16" and mfu_flops > 0 and on_accelerator:
      # Device-time MFU: the axon relay adds ~40-60 ms of dispatch per
      # call, so divide the lowered per-step FLOPs (cost_analysis reports
      # the scanned BODY = one step) by the MARGINAL step cost
      # (10*t_j10 - t_j1)/9 — this matches the profiler's device time
      # (61.3 ms vs 63.3 marginal, tools/profile_step.py). Round-2's
      # 19.5% figure divided by the j1 wall time incl. dispatch; same
      # FLOPs, wrong denominator.
      t1 = out.get("train_step_ms_bf16_j1")
      t5 = out.get("train_step_ms_bf16_j5")
      t10 = out.get("train_step_ms_bf16_j10")
      if t10 and (t5 or t1):
        # Prefer the (j5, j10) pair: both amortize the dispatch over many
        # steps, so one contended wall-clock sample can't skew the
        # difference the way a bad j1 reading does (observed: a 240 ms j1
        # under host load drove the j1-based marginal to 51 ms and MFU to
        # a fictitious 0.78).
        if t5:
          marginal = (t10 * 10 - t5 * 5) / 5
          estimator = "(10*t_j10 - 5*t_j5)/5"
        else:
          marginal = (t10 * 10 - t1) / 9
          estimator = "(10*t_j10 - t_j1)/9"
        out["train_step_ms_bf16_marginal"] = round(marginal, 2)
        peak, kind = _peak_flops(jax.devices()[0])
        mfu = mfu_flops / (marginal / 1e3) / peak / jax.device_count()
        # Self-check (VERDICT r4 #10): MFU > 1 means the peak table or the
        # estimator is wrong (the r2/r3 394-vs-197 TFLOP/s accounting error
        # shipped twice). Flag it in the artifact instead of reporting it.
        out["mfu_peak_tflops"] = round(peak / 1e12, 1)
        out["mfu_estimator"] = estimator
        if mfu > 1.0:
          out["mfu_error"] = (f"computed MFU {mfu:.3f} > 1 — peak table or "
                              "marginal estimator wrong; not reported")
        else:
          out["mfu_bf16_train"] = round(mfu, 4)
        out["mfu_peak_kind"] = kind
  # Throughput basis, explicit: the marginal device cost when available
  # (the wall times include the relay's ~40-60 ms dispatch, which is a
  # tunnel artifact, not a framework cost — PARITY.md round-3 MFU note),
  # else the best measured wall per-step time.
  if "train_step_ms_bf16_marginal" in out:
    best = out["train_step_ms_bf16_marginal"]
    out["train_throughput_basis"] = "bf16_marginal"
  else:
    best = min(v for k, v in out.items() if k.startswith("train_step_ms"))
    out["train_throughput_basis"] = "best_measured_wall"
  out["train_imgs_per_sec_per_chip"] = round(
      batch / (best / 1e3) / jax.device_count(), 1)
  if on_accelerator:
    out["train_vs_baseline"] = round(
        out["train_imgs_per_sec_per_chip"] /
        BASELINE_TRAIN_IMGS_PER_SEC_PER_CHIP, 3)
  return out


def bench_sampling(config, on_accelerator):
  """Headline: PC sampling throughput, batch 64 bf16 (measured-optimal;
  tools/sampling_batch_sweep.py — 128 is a local dip)."""
  import jax
  from score_sde_pytorch_tpu import sampling, sde as sde_lib
  from score_sde_pytorch_tpu.models import utils as mutils

  # bf16 inference: the TPU-native serving precision (params stay fp32,
  # norms/softmax fp32 — see models/layerspp.py). Training default is fp32.
  config.model.dtype = "bfloat16" if on_accelerator else "float32"
  sde = sde_lib.build_sde(config)
  batch = 64 if on_accelerator else 4
  shape = (batch, config.data.image_size, config.data.image_size, 3)
  model_def, variables = mutils.create_model(config, jax.random.PRNGKey(0))
  params = variables["params"]

  predictor = sampling.get_predictor(config.sampling.predictor)
  corrector = sampling.get_corrector(config.sampling.corrector)
  sampler = sampling.get_pc_sampler(
      sde, model_def, shape, predictor, corrector, lambda x: x,
      snr=config.sampling.snr, n_steps=config.sampling.n_steps_each,
      probability_flow=False, continuous=True, denoise=True)

  from score_sde_pytorch_tpu import losses
  rng = losses.as_prng_impl(jax.random.PRNGKey(0),
                            config.training.get("prng_impl"))
  _force(sampler(rng, params)[0])            # compile + warmup
  rounds = 5 if on_accelerator else 1
  t_ms = _median_ms(sampler, lambda i: (jax.random.fold_in(rng, i), params),
                    rounds)
  return batch / (t_ms / 1e3) / jax.device_count(), batch, rounds


def bench_dpmpp(config, on_accelerator):
  """DPM-Solver++(2M) fast-sampler throughput (20 single-NFE steps,
  batch 64 bf16 — measured 268 samples/s/chip on v5e,
  tools/fast_sampler_bench.py)."""
  import jax
  from score_sde_pytorch_tpu import sampling, sde as sde_lib
  from score_sde_pytorch_tpu.models import utils as mutils

  config.model.dtype = "bfloat16" if on_accelerator else "float32"
  sde = sde_lib.build_sde(config)
  batch = 64 if on_accelerator else 4
  shape = (batch, config.data.image_size, config.data.image_size, 3)
  model_def, variables = mutils.create_model(config, jax.random.PRNGKey(0))
  fn = sampling.get_dpmpp_sampler(sde, model_def, shape, lambda x: x,
                                  n_steps=20, denoise=True, continuous=True,
                                  eps=1e-5)
  params = variables["params"]
  rng = jax.random.PRNGKey(0)
  _force(fn(rng, params)[0])
  t_ms = _median_ms(fn, lambda i: (jax.random.fold_in(rng, i), params),
                    5 if on_accelerator else 1)
  return batch / (t_ms / 1e3) / jax.device_count()


def bench_model_zoo(on_accelerator):
  """Per-model train-step + sampling rows so BENCH speaks for the model zoo,
  not one net (VERDICT r2 #7): ddpm (vp/ddpm/cifar10, discrete DDPM loss)
  and ncsnv2_64 (ve/ncsnv2/cifar10, InstanceNorm++ hot path, SMLD loss +
  ald sampling). Marginal-cost timed; bf16 on TPU."""
  import jax
  from score_sde_pytorch_tpu import losses, sampling, sde as sde_lib
  from score_sde_pytorch_tpu.configs.vp.ddpm.cifar10 import (
      get_config as ddpm_config)
  from score_sde_pytorch_tpu.configs.ve.ncsnv2.cifar10 import (
      get_config as ncsnv2_config)

  out = {}
  n_lo, n_hi = (2, 10) if on_accelerator else (1, 2)
  batch = 128 if on_accelerator else 4
  for tag, get_cfg in (("ddpm", ddpm_config), ("ncsnv2", ncsnv2_config)):
    config = get_cfg()
    config.model.dtype = "bfloat16" if on_accelerator else "float32"
    if not on_accelerator:
      config.model.nf = 16
      # > beta_max (20): VP/subVP discrete betas must stay < 1 (sde.py guard)
      config.model.num_scales = 25
    size = config.data.image_size

    per_step, _ = marginal_train_step_ms(
        config, batch, n_lo, n_hi, rounds=3 if on_accelerator else 1)
    dt_tag = "bf16" if on_accelerator else "fp32"
    out[f"{tag}_train_step_ms_{dt_tag}"] = round(per_step, 2)
    out[f"{tag}_train_imgs_per_sec_per_chip"] = round(
        batch / (per_step / 1e3) / jax.device_count(), 1)

    # Sampling: the model's own configured sampler at a short N (the
    # per-NFE rate is N-independent — one scanned model eval per NFE).
    s_batch = 64 if on_accelerator else 4
    n_scales = 100 if on_accelerator else 25
    config.model.num_scales = n_scales
    sde_s = sde_lib.build_sde(config)
    from score_sde_pytorch_tpu.models import utils as mutils
    model_def, variables = mutils.create_model(config, jax.random.PRNGKey(0))
    sampler = sampling.get_pc_sampler(
        sde_s, model_def, (s_batch, size, size, 3),
        sampling.get_predictor(config.sampling.predictor),
        sampling.get_corrector(config.sampling.corrector), lambda x: x,
        snr=config.sampling.snr, n_steps=config.sampling.n_steps_each,
        continuous=config.training.continuous, denoise=True)
    rng = losses.as_prng_impl(jax.random.PRNGKey(0),
                              config.training.get("prng_impl"))
    _, nfe = sampler(rng, variables["params"])
    nfe = int(_force(nfe))                     # compile + warmup; real NFE
    t_ms = _median_ms(sampler,
                      lambda i: (jax.random.fold_in(rng, i),
                                 variables["params"]),
                      3 if on_accelerator else 1)
    out[f"{tag}_sampling_ms_per_nfe"] = round(t_ms / nfe, 2)
  return out


def bench_highres(on_accelerator):
  """256px row (VERDICT r3 #8): the shipped church-256 TPU leaf
  (configs/tpu/church_256_ncsnpp_tpu.py — bf16, remat, measured batch 32)
  timed with the same marginal-cost method as the flagship."""
  import jax
  from score_sde_pytorch_tpu.configs.tpu.church_256_ncsnpp_tpu import (
      get_config)
  config = get_config()
  batch = config.training.batch_size if on_accelerator else 2
  if not on_accelerator:
    config.model.update({"nf": 8, "num_res_blocks": 1, "ch_mult": (1, 2),
                         "attn_resolutions": (8,), "dtype": "float32",
                         "remat": False})
    config.data.image_size = 64
  n_lo, n_hi = (1, 3) if on_accelerator else (1, 2)
  per_step, _ = marginal_train_step_ms(
      config, batch, n_lo, n_hi, rounds=3 if on_accelerator else 1)
  tag = "bf16" if on_accelerator else "fp32"
  return {
      f"church256_train_step_ms_{tag}": round(per_step, 2),
      "church256_train_imgs_per_sec_per_chip": round(
          batch / (per_step / 1e3) / jax.device_count(), 2),
      "church256_batch": batch,
  }


def _devices_or_die(timeout_s: float = 300.0):
  """Backend init with a deadline.

  On relayed TPU backends a dead tunnel makes ``jax.devices()`` block
  forever inside the PJRT client constructor; a bench that hangs is worse
  than one that reports failure. Init in a daemon thread; if it misses
  the deadline, emit the one-line JSON contract with an error and exit
  (the C-API call is not interruptible, hence ``os._exit``).
  """
  import os
  import threading
  box = {}

  def init():
    import jax
    box["devices"] = jax.devices()

  t = threading.Thread(target=init, daemon=True)
  t.start()
  t.join(timeout_s)
  if "devices" not in box:
    print(json.dumps({
        "metric": "sampling_throughput", "value": None,
        "unit": "samples/s/chip", "vs_baseline": None,
        "extra": {"error": f"backend init exceeded {timeout_s:.0f}s "
                           "(TPU tunnel down?)"}}), flush=True)
    os._exit(3)
  return box["devices"]


class _Reporter:
  """Once-only JSON emitter + wall-clock budget.

  The driver records only what bench.py PRINTS; rc=124 with no JSON line is
  an empty round (BENCH_r04). The reporter owns the single output line:
  stages write into ``extra`` / ``set_headline`` as they finish, and
  whichever of (normal completion | budget watchdog) fires first prints.
  """

  def __init__(self, budget_s: float):
    import threading
    self.t0 = time.time()
    self.budget_s = budget_s
    self.extra = {}
    self.headline = None
    self._lock = threading.Lock()
    self._emitted = False

  def remaining(self) -> float:
    return self.budget_s - (time.time() - self.t0)

  def start_watchdog(self):
    import os
    import threading

    def watch():
      delay = self.remaining()
      if delay > 0:
        time.sleep(delay)
      self.extra.setdefault(
          "budget_exceeded",
          f"watchdog fired at {self.budget_s:.0f}s; partial results")
      self.emit()
      os._exit(0)  # a hung stage (relay compile) is not interruptible

    threading.Thread(target=watch, daemon=True).start()

  def set_headline(self, value: float):
    self.headline = value

  def emit(self):
    with self._lock:
      if self._emitted:
        return
      self._emitted = True
    self.extra["bench_wall_s"] = round(time.time() - self.t0, 1)
    print(json.dumps({
        "metric": "samples/sec/chip (NCSN++ cont. VE PC sampling, CIFAR-10)",
        "value": round(self.headline, 4) if self.headline else None,
        "unit": "samples/s/chip",
        "vs_baseline": round(self.headline / BASELINE_SAMPLES_PER_SEC_PER_CHIP,
                             3) if self.headline else None,
        "extra": self.extra,
    }), flush=True)


def _try_persistent_compile_cache():
  """Best-effort jax persistent compilation cache (cuts repeat-run compile
  cost when the same host serves consecutive rounds); harmless if the
  backend ignores it."""
  import os
  try:
    import jax
    cache_dir = os.environ.get("BENCH_COMPILE_CACHE",
                               "/tmp/score_sde_tpu_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
  except Exception:
    pass


def main():
  import os
  from score_sde_pytorch_tpu.utils.platform import sync_platform_from_env
  sync_platform_from_env()
  rep = _Reporter(float(os.environ.get("BENCH_BUDGET_S", "1500")))
  rep.start_watchdog()
  _devices_or_die()
  _try_persistent_compile_cache()
  import jax
  import score_sde_pytorch_tpu.models  # noqa: F401  (registry)
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  on_accelerator = jax.devices()[0].platform != "cpu"

  def fresh_config():
    config = get_config()
    if not on_accelerator:
      # CPU fallback (driver sanity runs): shrink hard so the bench
      # completes; the metric is only meaningful on TPU.
      config.model.num_scales = 10
      config.model.nf = 32
      config.model.num_res_blocks = 2
    return config

  rep.extra.update({
      "platform": jax.devices()[0].platform,
      "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
      "budget_s": rep.budget_s,
  })

  # --- Headline FIRST: the one number the artifact must carry. ---
  t_headline = time.time()
  try:
    samples_per_sec_per_chip, s_batch, s_rounds = bench_sampling(
        fresh_config(), on_accelerator)
    rep.set_headline(samples_per_sec_per_chip)
    rep.extra["sampling_batch"] = s_batch
    rep.extra["sampling_rounds"] = s_rounds
    rep.extra["sampling_nfe"] = 2000
  except Exception as e:
    rep.extra["sampling_error"] = repr(e)[:200]
  rep.extra["headline_wall_s"] = round(time.time() - t_headline, 1)

  # --- Optional rows, cheapest-first, each gated on remaining budget.
  # Cost estimates are worst-case TPU wall (compiles dominate); a stage
  # only starts if it plausibly fits, and the watchdog backstops mid-stage
  # overruns. Skipped stages are recorded so "absent row" never reads as
  # "measured and fine".
  stages = [
      ("train", 420.0, lambda: rep.extra.update(
          bench_train(fresh_config(), on_accelerator))),
      ("dpmpp", 180.0, lambda: rep.extra.update(
          {"dpmpp20_samples_per_sec_per_chip": round(
              bench_dpmpp(fresh_config(), on_accelerator), 2)})),
      ("model_zoo", 420.0, lambda: rep.extra.update(
          bench_model_zoo(on_accelerator))),
      # 420 s: two church-256 compiles dominate (~300-400 s measured warm);
      # a cache-warm run finishing headline+train+dpmpp+zoo in ~1030 s
      # (stage_walls_s, PARITY round-5 addendum) then has ~470 s left, and
      # the watchdog still emits the complete 4-stage JSON at the budget if
      # a cold compile overruns.
      ("highres", 420.0, lambda: rep.extra.update(
          bench_highres(on_accelerator))),
  ]
  skipped = []
  stage_walls = {}
  for name, est_s, run in stages:
    if rep.remaining() < est_s + 30.0:  # keep 30 s of slack to emit
      skipped.append(name)
      continue
    t_stage = time.time()
    try:
      run()
    except Exception as e:
      rep.extra[f"{name}_error"] = repr(e)[:200]
    stage_walls[name] = round(time.time() - t_stage, 1)
  if stage_walls:
    rep.extra["stage_walls_s"] = stage_walls
  if skipped:
    rep.extra["skipped_rows"] = skipped

  rep.emit()


if __name__ == "__main__":
  main()
