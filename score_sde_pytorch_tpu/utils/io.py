"""Filesystem helpers transparent to cloud-storage URIs.

The reference routes all file I/O through tf.io.gfile so GCS paths work
everywhere (reference main.py, run_lib.py:58-75, utils.py — SURVEY.md §5
"GCS-transparent"). Same here: paths with a scheme (gs://, s3://, hdfs://)
go through tf.io.gfile; plain local paths use the stdlib (no TF import on
the common path). Orbax checkpoints handle cloud URIs natively via
tensorstore, so this covers the npz/png/log artifacts.
"""
from __future__ import annotations

import os
from typing import IO


def _has_scheme(path: str) -> bool:
  return "://" in path


def makedirs(path: str) -> None:
  if _has_scheme(path):
    import tensorflow as tf
    tf.io.gfile.makedirs(path)
  else:
    os.makedirs(path, exist_ok=True)


def open_file(path: str, mode: str = "rb") -> IO:
  if _has_scheme(path):
    import tensorflow as tf
    return tf.io.gfile.GFile(path, mode)
  return open(path, mode)


def exists(path: str) -> bool:
  if _has_scheme(path):
    import tensorflow as tf
    return tf.io.gfile.exists(path)
  return os.path.exists(path)


def save_npz(path: str, **arrays) -> None:
  """np.savez_compressed through gfile when needed."""
  import numpy as np
  if _has_scheme(path):
    import io as _io
    buf = _io.BytesIO()
    np.savez_compressed(buf, **arrays)
    with open_file(path, "wb") as f:
      f.write(buf.getvalue())
  else:
    import numpy as np
    np.savez_compressed(path, **arrays)
