"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-host/multi-chip logic is tested single-process with
``xla_force_host_platform_device_count`` (the standard JAX substitute
for a fake cluster; SURVEY.md §4).  Env vars must be set before JAX
initializes, which is why they live at conftest import time.
"""

import os

# Force CPU: the session environment presets JAX_PLATFORMS=axon (a
# tunneled real TPU chip) which is the bench target, not the test target.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The sandbox's sitecustomize registers an "axon" PJRT plugin (a remote
# TPU tunnel) whose lazy initialization stalls the first jit for
# minutes even when JAX_PLATFORMS=cpu.  Deregister it for tests; the
# bench path (bench.py) keeps it.
try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:  # pragma: no cover - jax internals moved
    pass

# sitecustomize imports jax at interpreter startup, so JAX_PLATFORMS=axon
# from the outer env is already baked into the config; override it here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
