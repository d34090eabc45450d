"""Two-tier checkpointing (rolling preemption meta + numbered snapshots).

Rebuild of /root/reference/utils.py:7-29 and the cadence in
run_lib.py:72-77,136-153, on Orbax: sharded-array aware, atomic writes,
graceful-if-missing restore (cold-start and resume are the same call).
Layout:
  workdir/checkpoints-meta/   rolling, overwritten every
                              snapshot_freq_for_preemption steps
  workdir/checkpoints/<n>/    numbered snapshots keyed by step//snapshot_freq
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from score_sde_pytorch_tpu.utils import io as io_utils


def _path(p: str) -> str:
  """Resolve a workdir to what Orbax should see: local paths become
  absolute; mirror-backed schemes translate to their local root; gs://
  URIs pass through (Orbax/tensorstore handles GCS natively)."""
  p = io_utils.localize(p)
  if "://" in p:
    return p
  return os.path.abspath(os.path.expanduser(p))


class CheckpointManager:
  """Thin wrapper bundling the meta and numbered tiers."""

  def __init__(self, workdir: str):
    self.workdir = _path(workdir)
    self.meta_dir = os.path.join(self.workdir, "checkpoints-meta")
    self.ckpt_dir = os.path.join(self.workdir, "checkpoints")
    io_utils.makedirs(self.meta_dir)
    io_utils.makedirs(self.ckpt_dir)
    self._ckpt = ocp.StandardCheckpointer()

  # --- rolling meta tier (preemption resume) ---

  def save_meta(self, state: Any) -> None:
    path = os.path.join(self.meta_dir, "checkpoint")
    self._ckpt.save(path, state, force=True)
    self._ckpt.wait_until_finished()

  def restore_meta(self, state_template: Any) -> Any:
    """Restore the rolling checkpoint; returns the template unchanged when no
    checkpoint exists (reference utils.py:7-12 graceful cold start)."""
    path = os.path.join(self.meta_dir, "checkpoint")
    if not io_utils.exists(path):
      return state_template
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
    return self._ckpt.restore(path, abstract)

  # --- numbered snapshot tier ---

  def save_numbered(self, state: Any, number: int) -> None:
    path = os.path.join(self.ckpt_dir, f"checkpoint_{number}")
    self._ckpt.save(path, state, force=True)
    self._ckpt.wait_until_finished()

  def restore_numbered(self, state_template: Any, number: int) -> Any:
    path = os.path.join(self.ckpt_dir, f"checkpoint_{number}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
    return self._ckpt.restore(path, abstract)

  def has_numbered(self, number: int) -> bool:
    return io_utils.exists(os.path.join(self.ckpt_dir, f"checkpoint_{number}"))

  def latest_numbered(self) -> Optional[int]:
    nums = []
    for name in io_utils.listdir(self.ckpt_dir):
      if name.startswith("checkpoint_"):
        try:
          nums.append(int(name.split("_")[1]))
        except ValueError:
          pass
    return max(nums) if nums else None
