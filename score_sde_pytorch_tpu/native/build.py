"""Compile and load the native runtime shared library.

Mirrors the reference's JIT-at-import pattern for its CUDA extensions
(/root/reference/op/upfirdn2d.py:10-16) with g++ instead of nvcc: compile
once into a cache dir, reuse the .so on subsequent imports.
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import Optional

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["dataloader.cpp"]
_CACHE_DIR = os.environ.get(
    "SCORE_SDE_NATIVE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "score_sde_tpu_native"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _source_hash() -> str:
  h = hashlib.sha256()
  for s in _SOURCES:
    with open(os.path.join(_SRC_DIR, s), "rb") as f:
      h.update(f.read())
  return h.hexdigest()[:16]


def _build() -> Optional[str]:
  os.makedirs(_CACHE_DIR, exist_ok=True)
  so_path = os.path.join(_CACHE_DIR, f"libscoresde_{_source_hash()}.so")
  if os.path.exists(so_path):
    return so_path
  srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
  cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
         "-pthread", "-o", so_path + ".tmp"] + srcs
  try:
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    os.replace(so_path + ".tmp", so_path)
    return so_path
  except (subprocess.SubprocessError, OSError) as e:
    logging.warning("native build failed (%s); using Python fallback", e)
    return None


def get_library() -> Optional[ctypes.CDLL]:
  global _lib, _tried
  if _lib is not None or _tried:
    return _lib
  _tried = True
  so_path = _build()
  if so_path is None:
    return None
  lib = ctypes.CDLL(so_path)
  lib.dl_create.restype = ctypes.c_void_p
  lib.dl_create.argtypes = [
      ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
      ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
      ctypes.c_int, ctypes.c_int]
  lib.dl_next.restype = None
  lib.dl_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
  lib.dl_destroy.restype = None
  lib.dl_destroy.argtypes = [ctypes.c_void_p]
  _lib = lib
  return _lib


def native_available() -> bool:
  return get_library() is not None
