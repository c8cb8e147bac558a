import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is exercised by
# bench.py.  NOTE: this box's sitecustomize force-registers the axon TPU
# plugin and overrides jax_platforms, so we must override it back AFTER
# importing jax.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
