"""One-shot TPU measurement: flash attention vs dense + NCSN++ e2e forward.

Batched into a single script (remote compiles are minutes each; run once,
detached). Produces JSON lines with micro benches for the Pallas flash
attention vs the dense-logits path, an exactness check of the compiled
kernel on real TPU, and e2e NCSN++ forward times at 32px/256px.

Historical note (2026-08, v5e): this script also measured a fused Pallas
upfirdn2d kernel against the XLA conv path; the Pallas kernel lost on every
NCSN++ hot shape (0.44-0.88x) and VMEM-OOMed on 256px trunk shapes, so it
was removed — the single fused `lax.conv_general_dilated` IS the TPU fast
path. Flash attention won (1.19-1.60x at 32sq/64sq grids) and stayed.

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

  # ---- micro: flash attention vs dense --------------------------------
  from score_sde_pytorch_tpu.ops import attention as attn
  for (n, c, tag) in [(1024, 128, "32sq_c128"), (4096, 128, "64sq_c128"),
                      (1024, 256, "32sq_c256")]:
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(8, n, c)).astype(np.float32))
    kk = jnp.asarray(rng.normal(size=(8, n, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(8, n, c)).astype(np.float32))

    LOOPA = 20

    # NOTE: the scan body perturbs q with the carry so XLA cannot hoist the
    # loop-invariant op out of the scan.
    @jax.jit
    def loop_flash(q, kk, v):
      def body(h, _):
        return jnp.mean(attn.flash_attention(q + h, kk, v)), None
      s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=LOOPA)
      return s

    @jax.jit
    def loop_dense(q, kk, v):
      def body(h, _):
        return jnp.mean(attn.dense_attention(q + h, kk, v)), None
      s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=LOOPA)
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

  # ---- e2e: NCSN++ forward ---------------------------------------------
  from score_sde_pytorch_tpu.models import utils as mutils
  import score_sde_pytorch_tpu.models  # noqa: F401
  from score_sde_pytorch_tpu.configs.ve.cifar10_ncsnpp_continuous import (
      get_config)

  def e2e(size, batch):
    config = get_config()
    config.data.image_size = size
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
    out[f"ncsnpp_fwd_{size}px"] = {"ms": round(e2e(size, batch), 2),
                                   "batch": batch}
    print(json.dumps({f"ncsnpp_fwd_{size}px": out[f"ncsnpp_fwd_{size}px"]}),
          flush=True)

  print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
