"""Filesystem helpers transparent to cloud-storage URIs.

The reference routes all file I/O through tf.io.gfile so GCS paths work
everywhere (reference main.py:43, run_lib.py:58-75, utils.py — SURVEY.md §5
"GCS-transparent"). Same here: every artifact read/write in the pipelines
(run_lib, main, checkpoint) goes through these helpers. Paths with a scheme
(gs://, s3://, hdfs://) go through tf.io.gfile by default; plain local paths
use the stdlib (no TF import on the common path).

A scheme can also be bound to a custom handler with :func:`register_scheme`
— e.g. :class:`LocalMirrorHandler` maps ``myfs://...`` onto a local
directory, which is how the test suite exercises the full train/eval
pipelines against a non-local filesystem without network access.
"""
from __future__ import annotations

import os
from typing import IO, Dict, List, Optional

_SCHEME_HANDLERS: Dict[str, object] = {}


def _scheme(path: str) -> Optional[str]:
  if "://" in path:
    return path.split("://", 1)[0]
  return None


class GFileHandler:
  """Default remote handler: tf.io.gfile (GCS/S3/HDFS-transparent)."""

  def makedirs(self, path: str) -> None:
    import tensorflow as tf
    tf.io.gfile.makedirs(path)

  def open(self, path: str, mode: str) -> IO:
    import tensorflow as tf
    return tf.io.gfile.GFile(path, mode)

  def exists(self, path: str) -> bool:
    import tensorflow as tf
    return tf.io.gfile.exists(path)

  def listdir(self, path: str) -> List[str]:
    import tensorflow as tf
    return tf.io.gfile.listdir(path)

  def localize(self, path: str) -> str:
    # No local equivalent: libraries that do their own I/O (Orbax via
    # tensorstore, tf.io consumers) receive the URI unchanged.
    return path


class LocalMirrorHandler:
  """Maps ``<scheme>://<rest>`` onto a local directory tree.

  Useful for local mirrors of remote buckets and for testing the pipelines'
  URI-handling end-to-end (the test registers ``myfs://`` → tmpdir and runs
  train+eval with a ``myfs://`` workdir).
  """

  def __init__(self, scheme: str, root: str):
    self.scheme = scheme
    self.root = root

  def localize(self, path: str) -> str:
    rest = path.split("://", 1)[1].lstrip("/")
    return os.path.join(self.root, rest)

  def makedirs(self, path: str) -> None:
    os.makedirs(self.localize(path), exist_ok=True)

  def open(self, path: str, mode: str) -> IO:
    local = self.localize(path)
    if any(m in mode for m in ("w", "a", "+")):
      os.makedirs(os.path.dirname(local), exist_ok=True)
    return open(local, mode)

  def exists(self, path: str) -> bool:
    return os.path.exists(self.localize(path))

  def listdir(self, path: str) -> List[str]:
    return os.listdir(self.localize(path))


_DEFAULT_REMOTE = GFileHandler()


def register_scheme(scheme: str, handler) -> None:
  _SCHEME_HANDLERS[scheme] = handler


def unregister_scheme(scheme: str) -> None:
  _SCHEME_HANDLERS.pop(scheme, None)


def _handler(path: str):
  """Handler for a path, or None when the path is plain-local."""
  scheme = _scheme(path)
  if scheme is None:
    return None
  return _SCHEME_HANDLERS.get(scheme, _DEFAULT_REMOTE)


def makedirs(path: str) -> None:
  h = _handler(path)
  if h is None:
    os.makedirs(path, exist_ok=True)
  else:
    h.makedirs(path)


def open_file(path: str, mode: str = "rb") -> IO:
  h = _handler(path)
  if h is None:
    return open(path, mode)
  return h.open(path, mode)


def exists(path: str) -> bool:
  h = _handler(path)
  if h is None:
    return os.path.exists(path)
  return h.exists(path)


def listdir(path: str) -> List[str]:
  h = _handler(path)
  if h is None:
    return os.listdir(path)
  return h.listdir(path)


def localize(path: str) -> str:
  """Local filesystem path when the scheme handler can provide one, else the
  path unchanged. For libraries that do their own I/O (Orbax/tensorstore,
  TensorBoard writers): gs:// URIs pass through untouched (they handle GCS
  natively); mirror-backed schemes translate to their local root."""
  h = _handler(path)
  if h is None:
    return path
  return h.localize(path)


def save_npz(path: str, **arrays) -> None:
  """np.savez_compressed through the scheme handler when needed."""
  import numpy as np
  h = _handler(path)
  if h is None:
    np.savez_compressed(path, **arrays)
    return
  import io as _io
  buf = _io.BytesIO()
  np.savez_compressed(buf, **arrays)
  with open_file(path, "wb") as f:
    f.write(buf.getvalue())


def save_npy(path: str, array) -> None:
  """np.save through the scheme handler (same ``.npy``-appending semantics
  as np.save on a string path)."""
  import numpy as np
  if not path.endswith(".npy"):
    path = path + ".npy"
  h = _handler(path)
  if h is None:
    np.save(path, array)
    return
  import io as _io
  buf = _io.BytesIO()
  np.save(buf, array)
  with open_file(path, "wb") as f:
    f.write(buf.getvalue())


def load_npz(path: str):
  """np.load of an .npz through the scheme handler; returns a dict."""
  import numpy as np
  with open_file(path, "rb") as f:
    with np.load(f) as z:
      return {k: z[k] for k in z.files}
