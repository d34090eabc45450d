"""Exponential moving average of parameters as a pure pytree op.

Rebuild of /root/reference/models/ema.py:10-98. The torch version is a
stateful object holding shadow tensors; here EMA state is just a params
pytree + step count, updated functionally (jit/scan/pjit friendly).
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class EMAState:
  decay: float = flax.struct.field(pytree_node=False)
  params: Any = None
  num_updates: jnp.ndarray = flax.struct.field(default=None)


def init(params, decay: float = 0.999) -> EMAState:
  return EMAState(decay=decay, params=jax.tree.map(jnp.array, params),
                  num_updates=jnp.zeros((), jnp.int32))


def update(state: EMAState, new_params) -> EMAState:
  """Shadow ← decay·shadow + (1−decay)·params with warmup decay
  ``min(decay, (1+n)/(10+n))`` (reference ema.py:32-42)."""
  n = state.num_updates + 1
  decay = jnp.minimum(state.decay, (1.0 + n) / (10.0 + n))
  shadow = jax.tree.map(
      lambda e, p: e - (1.0 - decay) * (e - p), state.params, new_params)
  return state.replace(params=shadow, num_updates=n)
