"""Device mesh + sharding: the TPU-native replacement for DataParallel.

The reference's entire distributed backend is a single-process
`torch.nn.DataParallel` wrap (/root/reference/models/utils.py:93 —
replicate/scatter/gather every step). Here parallelism is declarative:
one `jax.sharding.Mesh` with a ``data`` axis (and an optional ``space``
axis for ≥256px spatial sharding, SURVEY.md §2.7), `NamedSharding`
annotations on the batch, replicated parameters, and XLA's SPMD partitioner
inserting the gradient `psum` over ICI. Multi-host extends the same mesh
over all processes (`jax.distributed.initialize` at the pipeline layer).
"""
from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def create_mesh(n_data: int = -1, n_space: int = 1,
                devices=None) -> Mesh:
  """Build a (data, space) mesh. ``n_data=-1`` → all remaining devices.

  With ``n_space=1`` this is pure data parallelism; ``n_space>1`` shards the
  image height axis for large-resolution models.
  """
  devices = devices if devices is not None else jax.devices()
  n_total = len(devices)
  if n_data == -1:
    n_data = n_total // n_space
  assert n_data * n_space == n_total, (
      f"mesh {n_data}x{n_space} != {n_total} devices")
  dev_array = np.asarray(devices).reshape(n_data, n_space)
  return Mesh(dev_array, (DATA_AXIS, SPACE_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
  """Batch axis sharded over data; everything else replicated."""
  return NamedSharding(mesh, P(DATA_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
  """NHWC activations: batch over data, H over space (≥256px models)."""
  return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def constrain_spatial(x):
  """Constrain an NHWC activation to P('data', 'space').

  Requires an ambient mesh (``with jax.set_mesh(mesh):``) with those axis
  names; used by models when ``config.model.spatial_sharding`` is on so the
  H-axis sharding sticks through the network instead of being re-gathered
  (SURVEY.md §2.7 spatial sharding for ≥256px). No-op when there is no
  ambient mesh or the activation's (N, H) dims don't divide the mesh (e.g.
  the batch-1 init trace, or H below the shard count deep in the U-Net)."""
  mesh = jax.sharding.get_abstract_mesh()
  if mesh is None or mesh.empty or DATA_AXIS not in mesh.shape:
    return x
  n_data = mesh.shape[DATA_AXIS]
  n_space = mesh.shape.get(SPACE_AXIS, 1)
  if x.shape[0] % n_data != 0 or x.shape[1] % n_space != 0:
    return x
  return jax.lax.with_sharding_constraint(x, P(DATA_AXIS, SPACE_AXIS))


def batch_constraint(mesh) -> Callable:
  """Sharding constraint pinning a tensor's batch axis to the data axis.

  Returns identity when ``mesh`` is None. Lets the ODE/heun/likelihood
  paths be mesh-sharded without ``in_shardings`` (which can't express their
  optional arguments): one constraint on the initial state and XLA's SPMD
  partitioner propagates it through the whole scanned/while'd chain.
  """
  if mesh is None:
    return lambda x: x
  sharding = NamedSharding(mesh, P(DATA_AXIS))
  return lambda x: jax.lax.with_sharding_constraint(x, sharding)


def place_replicated(mesh, *args):
  """device_put each arg (pytrees ok, None passed through) replicated on
  the mesh; identity when ``mesh`` is None.

  The constraint-based mesh paths (ode/heun/dpmpp/likelihood) use a bare
  ``jit`` + in-body sharding constraint, and jit then requires EVERY
  argument to live on the constraint's device set: an input committed to a
  single device — e.g. params restored by Orbax in ``run_lib.evaluate`` —
  fails with "Received incompatible devices" (device ids [0] vs the mesh).
  The PC sampler avoids this with explicit replicated ``in_shardings``
  (which can't express the others' optional arguments); this gives the
  constraint-based paths the same tolerance. No copy when an arg is
  already placed correctly.
  """
  if mesh is None:
    return args
  rep = replicated(mesh)
  return tuple(None if a is None else jax.device_put(a, rep) for a in args)


def to_local(*args):
  """Pull replicated global-mesh arrays down to host-local arrays.

  A jit entered by ONE process over inputs committed to a multi-host mesh
  is a global computation entered by one participant — a collective
  deadlock (or "non-addressable devices" error). For a REPLICATED array
  every addressable shard already holds the full value, so the local copy
  (``addressable_data(0)``) costs no cross-host traffic. Non-replicated
  global arrays (per-shard shape != global shape) are rejected rather than
  silently truncated. Pytrees ok; non-Array leaves pass through.
  """
  def pull(x):
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
      shard = x.addressable_data(0)
      if shard.shape != x.shape:
        raise ValueError(
            f"to_local needs a replicated array; got per-shard shape "
            f"{shard.shape} != global {x.shape}.")
      return shard
    return x
  out = tuple(jax.tree.map(pull, a) for a in args)
  return out[0] if len(out) == 1 else out


def shard_batch(batch, mesh: Mesh):
  """Place a host numpy batch onto the mesh, sharded along the batch dim."""
  return jax.device_put(batch, data_sharding(mesh))


def make_sharded_step(step_fn: Callable, mesh: Mesh,
                      donate_state: bool = True) -> Callable:
  """jit a ``(state, batch) -> (state, loss)`` step for the mesh.

  Params/opt state replicated, batch data-sharded; XLA SPMD inserts the
  gradient all-reduce. State buffers are donated (in-place update on device).
  """
  state_sharding = replicated(mesh)
  batch_sharding = data_sharding(mesh)
  return jax.jit(
      step_fn,
      in_shardings=(state_sharding, batch_sharding),
      out_shardings=(state_sharding, state_sharding),
      donate_argnums=(0,) if donate_state else ())


def make_sharded_n_step(n_step_fn: Callable, mesh: Mesh,
                        donate_state: bool = True) -> Callable:
  """Like :func:`make_sharded_step` for stacked ``[n_steps, B, ...]`` batches
  (batch dim 1 sharded)."""
  state_sharding = replicated(mesh)
  batches_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
  return jax.jit(
      n_step_fn,
      in_shardings=(state_sharding, batches_sharding),
      out_shardings=(state_sharding, state_sharding),
      donate_argnums=(0,) if donate_state else ())
