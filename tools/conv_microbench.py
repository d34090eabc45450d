"""Hot-conv reformulation microbench (VERDICT r3 #5, experiment 2).

The r3 profile pins 80% of flagship train-step device time inside XLA conv
fusions at 40-50% per-conv MXU utilization. This measures whether an
explicit im2col→matmul reformulation (conv_general_dilated_patches + dot,
a pure-MXU expression XLA tiles like any big matmul) beats XLA's native
conv lowering on the NCSN++ hot shapes — batch 128 bf16, fused
bias+swish epilogue, timed as in-jit loops so dispatch cancels.

If the matmul form wins, the model's conv3x3 gains a dispatch flag; if it
loses, that is the negative result the verdict asks to record.

    python tools/conv_microbench.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REPS = 40  # in-jit loop length


def _bench(fn, *args):
  import jax
  out = fn(*args)
  np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
  ts = []
  for _ in range(5):
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
    ts.append((time.time() - t0) * 1e3)
  return float(np.median(ts)) / REPS


def main():
  from score_sde_pytorch_tpu.utils.platform import sync_platform_from_env
  sync_platform_from_env()
  import jax
  import jax.numpy as jnp
  from jax import lax

  # (H, W, Cin, Cout) hot shapes from the flagship profile.
  shapes = [(32, 32, 128, 128), (16, 16, 256, 256), (16, 16, 128, 256)]
  batch = 128
  results = []
  for (h, w, cin, cout) in shapes:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, h, w, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.bfloat16)

    @jax.jit
    def conv_native(x, k, b):
      def body(i, acc):
        y = lax.conv_general_dilated(
            acc, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jax.nn.swish(y + b.astype(jnp.float32))
        return y.astype(jnp.bfloat16)[..., :acc.shape[-1]]
      return lax.fori_loop(0, REPS, body, x)

    @jax.jit
    def conv_im2col(x, k, b):
      k2 = k.reshape(9 * k.shape[2], k.shape[3])
      def body(i, acc):
        p = lax.conv_general_dilated_patches(
            acc, (3, 3), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.dot(p.reshape(-1, p.shape[-1]), k2,
                    preferred_element_type=jnp.float32)
        y = jax.nn.swish(y.reshape(acc.shape[0], acc.shape[1], acc.shape[2],
                                   -1) + b.astype(jnp.float32))
        return y.astype(jnp.bfloat16)[..., :acc.shape[-1]]
      return lax.fori_loop(0, REPS, body, x)

    t_native = _bench(conv_native, x, k, b)
    t_im2col = _bench(conv_im2col, x, k, b)
    flops = 2 * batch * h * w * 9 * cin * cout
    row = {
        "shape": f"{h}x{w} c{cin}->c{cout} b{batch}",
        "native_ms": round(t_native, 3),
        "im2col_ms": round(t_im2col, 3),
        "native_mxu": round(flops / (t_native / 1e3) / 197e12, 3),
        "im2col_mxu": round(flops / (t_im2col / 1e3) / 197e12, 3),
        "speedup_im2col": round(t_native / t_im2col, 3),
    }
    results.append(row)
    print(json.dumps(row), flush=True)
  print(json.dumps({"all": results}))


if __name__ == "__main__":
  main()
