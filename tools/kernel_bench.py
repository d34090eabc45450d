"""In-jit kernel microbenchmark harness.

Per-call dispatch through the TPU relay costs ~hundreds of microseconds,
swamping small-kernel timings. This harness loops the op N times INSIDE one
jitted program (lax.fori_loop with a data dependency so XLA cannot hoist the
op), so a single dispatch measures N executions.

    python tools/kernel_bench.py   # upfirdn2d path + flash-vs-dense attention

(The Pallas upfirdn2d variant this used to compare was removed 2026-08 after
measuring 0.44-0.88x of the fused-conv XLA path on v5e — see PARITY.md.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_op(fn, *args, iters: int = 200, reps: int = 3) -> float:
  """Median seconds per single op execution (in-jit loop)."""
  import jax
  import jax.numpy as jnp

  @jax.jit
  def loop(x0, *rest):
    def body(i, carry):
      y = fn(carry, *rest)
      # Data dependency: fold a scalar of the output back into the input
      # so the loop cannot be collapsed. Keep shapes static by re-slicing.
      return carry + 1e-12 * jnp.mean(y)

    return jax.lax.fori_loop(0, iters, body, x0)

  out = loop(*args)  # compile + warmup
  np.asarray(out)
  times = []
  for _ in range(reps):
    t0 = time.time()
    np.asarray(loop(*args))
    times.append((time.time() - t0) / iters)
  return float(np.median(times))


def main():
  import jax.numpy as jnp
  from score_sde_pytorch_tpu.ops.upfirdn2d import upfirdn2d as xla_up
  from score_sde_pytorch_tpu.ops import attention as attn

  k1d = np.array([1., 3., 3., 1.]) / 8.0
  cases = [
      ("up2 64x16x16x256", (64, 16, 16, 256), 2, 1, (2, 1)),
      ("down2 64x32x32x128", (64, 32, 32, 128), 1, 2, (1, 1)),
  ]
  for name, shape, up, down, pad in cases:
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape)
                    .astype(np.float32))
    # Per-iteration floor of the loop harness itself on this relay
    # (measured ~2.6 ms on the axon tunnel): subtract from op timings.
    floor = bench_op(lambda a: a * 1.000001, x)
    print(f"{name}: harness floor {floor * 1e6:.1f}us", flush=True)

    def f_xla(a):
      return xla_up(a, jnp.asarray(k1d), up=up, down=down, pad=pad)

    t_xla = max(bench_op(f_xla, x) - floor, 1e-9)
    print(f"{name}: XLA {t_xla * 1e6:.1f}us (floor-corrected)", flush=True)

  for (n, c, tag) in [(1024, 128, "attn 32sq c128"),
                      (4096, 128, "attn 64sq c128")]:
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(8, n, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(8, n, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(8, n, c)).astype(np.float32))
    floor = bench_op(lambda a, *_: a * 1.000001, q, k, v, iters=50)
    t_f = max(bench_op(attn.flash_attention, q, k, v, iters=50) - floor, 1e-9)
    t_d = max(bench_op(attn.dense_attention, q, k, v, iters=50) - floor, 1e-9)
    print(f"{tag}: flash {t_f * 1e3:.3f}ms dense {t_d * 1e3:.3f}ms "
          f"ratio {t_d / t_f:.2f}x", flush=True)


if __name__ == "__main__":
  main()
