"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the driver separately dry-runs the
multi-chip path).  This must happen before any backend initialization:

* The axon TPU-tunnel plugin registers itself via sitecustomize in every
  interpreter; its first backend touch costs 10-250 s of tunnel setup, so we
  drop its factory and pin the platform to cpu.
* 8 virtual CPU devices back the `parallel/` sharding tests.
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# No persistent compile cache under pytest: CPU executable (de)serialization
# segfaults intermittently in this jaxlib (both reading mixed-feature entries
# and writing certain executables).  Tests recompile per session.
os.environ["MARLIN_TPU_XLA_CACHE"] = ""

import jax  # noqa: E402

try:  # drop the axon PJRT factory so it is never initialized in tests
    from jax._src import xla_bridge as _xb

    # keep the stock 'tpu' factory registered (pallas lowering registration
    # expects the platform to exist); only the tunnel plugin is dropped
    for _name in list(getattr(_xb, "_backend_factories", {})):
        if _name not in ("cpu", "interpreter", "tpu"):
            _xb._backend_factories.pop(_name, None)
except Exception:  # pragma: no cover
    pass

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover - older jax
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
