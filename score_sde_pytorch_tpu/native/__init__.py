"""Native (C++) runtime components, loaded via ctypes.

Build-on-first-use with graceful Python fallback: if the toolchain or build
fails, callers fall back to the pure-numpy pipeline (`datasets.DatasetIterator`).
"""
from score_sde_pytorch_tpu.native.build import get_library, native_available
from score_sde_pytorch_tpu.native.loader import NativeDataLoader

__all__ = ["get_library", "native_available", "NativeDataLoader"]
