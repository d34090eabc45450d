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

# The image's sitecustomize force-registers the axon TPU backend via
# jax.config.update("jax_platforms", "axon,cpu"), which overrides env vars —
# override it back before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
