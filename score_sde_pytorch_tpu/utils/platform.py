"""Make the ``JAX_PLATFORMS`` env var authoritative.

On managed TPU images a sitecustomize may force-register the TPU backend
with ``jax.config.update("jax_platforms", ...)`` at interpreter start;
the config value overrides the env var, so a tool launched with
``JAX_PLATFORMS=cpu`` would still initialize (and, if the TPU tunnel is
down, hang on) the TPU backend. ``tests/conftest.py``, ``main.py
--platform`` and ``__graft_entry__`` each counter-override locally; this
helper is the shared version for CLI tools.

No reference counterpart: the reference's device selection is torch's
``cuda:0`` probing (reference run_lib.py has no platform indirection).
"""
import os


def sync_platform_from_env() -> None:
  """If ``JAX_PLATFORMS`` is set, re-assert it over the jax config.

  Must run before any backend is initialized (i.e. before the first
  ``jax.devices()`` / array creation). No-op when the env var is unset.
  """
  platforms = os.environ.get("JAX_PLATFORMS")
  if platforms:
    import jax
    jax.config.update("jax_platforms", platforms)
