"""In-jit kernel microbenchmark harness.

Per-call dispatch through the TPU relay costs ~hundreds of microseconds,
swamping small-kernel timings. This harness loops the op N times INSIDE one
jitted program (lax.fori_loop with a data dependency so XLA cannot hoist the
op), so a single dispatch measures N executions.

    python tools/kernel_bench.py            # upfirdn2d XLA vs Pallas table
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_op(fn, x, iters: int = 200, reps: int = 3) -> float:
  """Median seconds per single op execution (in-jit loop)."""
  import jax
  import jax.numpy as jnp

  @jax.jit
  def loop(x0):
    def body(i, carry):
      y = fn(carry)
      # Data dependency: fold a scalar of the output back into the input
      # so the loop cannot be collapsed. Keep shapes static by re-slicing.
      return carry + 1e-12 * jnp.mean(y)

    return jax.lax.fori_loop(0, iters, body, x0)

  out = loop(x)  # compile + warmup
  np.asarray(out)
  times = []
  for _ in range(reps):
    t0 = time.time()
    np.asarray(loop(x))
    times.append((time.time() - t0) / iters)
  return float(np.median(times))


def main():
  import jax.numpy as jnp
  from score_sde_pytorch_tpu.ops.upfirdn2d import upfirdn2d as xla_up
  from score_sde_pytorch_tpu.ops.upfirdn2d_pallas import (
      pallas_eligible, upfirdn2d_pallas)

  k1d = tuple((np.array([1., 3., 3., 1.]) / 8.0).tolist())
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
      return xla_up(a, jnp.asarray(np.array(k1d)), up=up, down=down, pad=pad)

    t_xla = max(bench_op(f_xla, x) - floor, 1e-9)
    line = f"{name}: XLA {t_xla * 1e6:.1f}us (floor-corrected)"
    print(line, flush=True)
    if pallas_eligible(x, np.array(k1d), up, down):
      def f_pl(a):
        return upfirdn2d_pallas(a, k1d, up=up, down=down, pad=pad)

      try:
        t_pl = max(bench_op(f_pl, x) - floor, 1e-9)
        print(f"{name}: Pallas {t_pl * 1e6:.1f}us (floor-corrected)   "
              f"ratio {t_xla / t_pl:.2f}x", flush=True)
      except NotImplementedError as e:
        # Mosaic currently rejects some rewrites when the kernel body is
        # inlined into a fori_loop; standalone dispatch still works.
        print(f"{name}: Pallas in-loop lowering unsupported ({e})",
              flush=True)
    else:
      print(f"{name}: Pallas ineligible (falls back)", flush=True)


if __name__ == "__main__":
  main()
