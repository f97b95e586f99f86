"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (SURVEY.md §4): all "parties" are
logical, hosted in one process; multi-device sharding is exercised through
XLA's host-platform device-count override.  Real-TPU execution is covered by
bench.py / __graft_entry__.py, not the unit tests.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# The ambient axon TPU plugin sets JAX_PLATFORMS=axon; tests must run on CPU
# (the env var alone is overridden by the plugin, so use jax.config).
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the limb-arithmetic graphs are large and
# recompiling them on every pytest run dominates wall-clock otherwise.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
