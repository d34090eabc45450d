"""Shared child-process environment for subprocess-driving tests.

The image's sitecustomize registers the axon TPU PJRT plugin whenever
``PALLAS_AXON_POOL_IPS`` is set, and its ``register()`` overrides
``jax_platforms`` via ``jax.config.update`` — so a child's
``JAX_PLATFORMS=cpu`` env var alone does NOT keep it off the TPU tunnel.
With a healthy tunnel that is just wasted init time; with a wedged tunnel
(e.g. a prior TPU client killed mid-stream) every child process hangs
inside ``make_c_api_client`` before running a single line of test code.

Dropping ``PALLAS_AXON_POOL_IPS`` from the child env disables the
registration entirely, which makes ``JAX_PLATFORMS=cpu`` authoritative.
``tests/conftest.py`` achieves the same in-process via
``jax.config.update("jax_platforms", "cpu")``; subprocesses need it at
spawn time.
"""
import os


def cpu_child_env(**overrides):
  """os.environ copy pinned to CPU-only JAX, axon registration disabled.

  Keyword overrides are stringified and applied last.
  """
  env = dict(os.environ)
  env.pop("PALLAS_AXON_POOL_IPS", None)
  env["JAX_PLATFORMS"] = "cpu"
  env.update({k: str(v) for k, v in overrides.items()})
  return env
