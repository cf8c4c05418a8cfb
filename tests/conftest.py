"""Test config: run on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4).

NOTE the env var JAX_PLATFORMS is NOT enough on this machine — the axon TPU
PJRT plugin overrides it; jax.config.update after import is required.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the machine env exports JAX_PLATFORMS=axon (sitecustomize registers the
# TPU plugin in every process); BOTH the env var and the config must say
# cpu or the two race — late backend initialization can flip to the axon
# device mid-suite (observed: tests that do several seconds of numpy work
# before their first jax call saw 1 axon device instead of 8 cpu)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
