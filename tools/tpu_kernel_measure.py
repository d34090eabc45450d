"""One-shot TPU measurement: Pallas upfirdn2d and flash attention vs XLA.

Batched into a single script (remote compiles are minutes each; run once,
detached). Produces JSON lines with e2e NCSN++ forward times at 32px/256px
with fused_fir on/off, micro benches for upfirdn2d and attention, and an
exactness check of the compiled kernels on real TPU.

    python tools/tpu_kernel_measure.py [--skip-256]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _force(x):
  # block_until_ready does not block on relayed TPU backends
  return np.asarray(x)


def _time_ms(fn, *args, rounds=5):
  fn(*args)  # warmup (compile)
  _force(fn(*args))
  ts = []
  for _ in range(rounds):
    t0 = time.time()
    _force(fn(*args))
    ts.append((time.time() - t0) * 1e3)
  return float(np.median(ts))


def main():
  import jax
  import jax.numpy as jnp

  out = {"platform": jax.devices()[0].platform}

  # ---- micro: upfirdn2d pallas vs xla, looped in-jit to defeat dispatch ---
  import importlib
  u = importlib.import_module("score_sde_pytorch_tpu.ops.upfirdn2d")
  from score_sde_pytorch_tpu.ops import upfirdn2d_pallas as up

  k = tuple((np.asarray([1., 3., 3., 1.]) / 8.0).tolist())
  LOOP = 50
  for (h, w, c, upf, downf, tag) in [
      (32, 32, 256, 2, 1, "up2_32x32x256"),
      (64, 64, 128, 1, 2, "down2_64x64x128"),
      (128, 128, 128, 2, 1, "up2_128x128x128"),
  ]:
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, h, w, c)).astype(np.float32))
    pad_up = ((len(k) - upf + 1) // 2 + upf - 1, (len(k) - upf) // 2)
    pad_dn = ((len(k) - downf + 1) // 2, (len(k) - downf) // 2)
    pad = pad_up if upf > 1 else pad_dn

    @jax.jit
    def loop_pallas(x):
      def body(h, _):
        y = up.upfirdn2d_pallas(x, k, up=upf, down=downf, pad=pad)
        return h + jnp.sum(y), None
      s, _ = jax.lax.scan(body, 0.0, None, length=LOOP)
      return s

    @jax.jit
    def loop_xla(x):
      def body(h, _):
        y = u.upfirdn2d(x, jnp.asarray(k), up=upf, down=downf, pad=pad)
        return h + jnp.sum(y), None
      s, _ = jax.lax.scan(body, 0.0, None, length=LOOP)
      return s

    # exactness of the compiled kernel on TPU
    got = _force(up.upfirdn2d_pallas(x, k, up=upf, down=downf, pad=pad))
    want = _force(u.upfirdn2d(x, jnp.asarray(k), up=upf, down=downf, pad=pad))
    exact = bool(np.allclose(got, want, atol=1e-4))
    t_p = _time_ms(loop_pallas, x) / LOOP
    t_x = _time_ms(loop_xla, x) / LOOP
    out[f"upfirdn_{tag}"] = {"pallas_ms": round(t_p, 4),
                             "xla_ms": round(t_x, 4),
                             "speedup": round(t_x / t_p, 3),
                             "exact": exact}
    print(json.dumps({f"upfirdn_{tag}": out[f"upfirdn_{tag}"]}), flush=True)

  # ---- micro: flash attention vs dense --------------------------------
  from score_sde_pytorch_tpu.ops import attention as attn
  for (n, c, tag) in [(1024, 128, "32sq_c128"), (4096, 128, "64sq_c128"),
                      (1024, 256, "32sq_c256")]:
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(8, n, c)).astype(np.float32))
    kk = jnp.asarray(rng.normal(size=(8, n, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(8, n, c)).astype(np.float32))

    LOOPA = 20

    @jax.jit
    def loop_flash(q, kk, v):
      def body(h, _):
        return h + jnp.sum(attn.flash_attention(q, kk, v)), None
      s, _ = jax.lax.scan(body, 0.0, None, length=LOOPA)
      return s

    @jax.jit
    def loop_dense(q, kk, v):
      def body(h, _):
        return h + jnp.sum(attn.dense_attention(q, kk, v)), None
      s, _ = jax.lax.scan(body, 0.0, None, length=LOOPA)
      return s

    got = _force(attn.flash_attention(q, kk, v))
    want = _force(attn.dense_attention(q, kk, v))
    exact = bool(np.allclose(got, want, atol=1e-3))
    t_f = _time_ms(loop_flash, q, kk, v) / LOOPA
    t_d = _time_ms(loop_dense, q, kk, v) / LOOPA
    out[f"attn_{tag}"] = {"flash_ms": round(t_f, 4),
                          "dense_ms": round(t_d, 4),
                          "speedup": round(t_d / t_f, 3), "exact": exact}
    print(json.dumps({f"attn_{tag}": out[f"attn_{tag}"]}), flush=True)

  # ---- e2e: NCSN++ forward with fused_fir on/off -----------------------
  from score_sde_pytorch_tpu.models import utils as mutils
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  def e2e(size, batch, fused, skip=False):
    if skip:
      return None
    config = get_config()
    config.data.image_size = size
    config.model.fused_fir = fused
    if size >= 256:
      # church/bedroom 256px architecture (configs/ve/church_...)
      config.model.ch_mult = (1, 1, 2, 2, 2, 2, 2)
      config.model.num_res_blocks = 2
      config.model.progressive = "output_skip"
      config.model.progressive_input = "input_skip"
    model_def, variables = mutils.create_model(config, jax.random.PRNGKey(0))

    @jax.jit
    def fwd(params, x, t):
      return model_def.apply({"params": params}, x, t, train=False)

    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    t = jnp.full((batch,), 25.0, jnp.float32)
    return _time_ms(fwd, variables["params"], x, t, rounds=5)

  skip256 = "--skip-256" in sys.argv
  for size, batch in [(32, 128), (256, 8)]:
    if size == 256 and skip256:
      continue
    t_off = e2e(size, batch, fused=False)
    t_on = e2e(size, batch, fused=True)
    out[f"ncsnpp_fwd_{size}px"] = {
        "xla_ms": round(t_off, 2), "fused_fir_ms": round(t_on, 2),
        "speedup": round(t_off / t_on, 3)}
    print(json.dumps({f"ncsnpp_fwd_{size}px": out[f"ncsnpp_fwd_{size}px"]}),
          flush=True)

  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
