"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch the real TPU chip — multi-device sharding is validated on a
faked CPU mesh via --xla_force_host_platform_device_count (the standard JAX
answer to testing pod code without a pod; SURVEY.md §4).

Note: the environment's sitecustomize registers a TPU backend and sets
JAX_PLATFORMS=axon at interpreter startup, so an env-var override is not
enough — we must rewrite jax.config before the first backend initialization.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache (round 4, suite-wall-time work): the suite
# is dominated by XLA:CPU compiles of the same programs run after run; a
# repo-local cache makes repeat runs start warm.  Cold behavior is
# unchanged (the cache only stores what was compiled anyway).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect an 8-device virtual CPU mesh"
