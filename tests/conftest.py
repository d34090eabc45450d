"""Test harness config: run on a virtual 8-device CPU mesh.

Environment variables must be set before jax initializes its backends, hence
the module-level assignments here (SURVEY.md §4(d)).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the image pre-sets JAX_PLATFORMS=axon
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
  os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The image's sitecustomize force-registers the axon TPU backend via
# jax.config.update("jax_platforms", "axon,cpu"), which overrides env vars —
# override it back before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_collection_modifyitems(config, items):
  """Tiering: everything not explicitly marked slow/multiprocess is `fast`,
  so `pytest -m fast` runs the sub-5-minute numerics/golden/config core and
  `pytest` (no -m) stays the full suite."""
  for item in items:
    if not any(m.name in ("slow", "multiprocess")
               for m in item.iter_markers()):
      item.add_marker(pytest.mark.fast)
