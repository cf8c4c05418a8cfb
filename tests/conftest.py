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

# persistent compile cache for the suite: jit compiles dominate its wall
# clock (~2/3 of the 12-19 min full run), and the programs are identical
# across runs.  Set via the ENV VAR (not only jax.config) so the CLI
# kill/resume tests' subprocesses inherit it too.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache_cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
