"""Test configuration: force CPU with 8 virtual devices and enable x64.

Math-identity tests check operators in float64 against hand-computed
references; multi-device tests use the virtual CPU mesh
(SURVEY.md §4 multi-node story).
"""

import os

# force CPU: the session env pins JAX_PLATFORMS to the TPU plugin, and two
# processes contending for the single chip deadlock — tests must never touch it
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# the axon TPU plugin overrides the JAX_PLATFORMS env var; the config knob
# is honored, so set it explicitly as well
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
