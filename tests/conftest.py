"""Test harness config: force an 8-device virtual CPU mesh.

The image boots every interpreter with an `axon` TPU backend preselected
(JAX_PLATFORMS=axon via sitecustomize); tests must run on host CPU with 8
virtual devices instead — multi-chip TPU hardware is not available in CI, and
sharding tests emulate the mesh (SURVEY.md §4: the reference likewise has no
multi-node test rig).

XLA_FLAGS must be set before the CPU backend initializes; the platform switch
itself is a runtime config update (the env var is overridden by the image).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
