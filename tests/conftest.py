"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip code paths are validated per SURVEY.md section 4 by forcing the
host platform to present 8 XLA devices. The axon TPU plugin in this
environment overrides JAX_PLATFORMS, so the platform is forced via
jax.config (which wins) before any test imports jax-dependent modules.

Set LITBOX_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("LITBOX_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
