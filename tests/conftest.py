"""Test configuration: run on CPU with 8 virtual devices and f64.

Mirrors the reference's CI strategy of testing multi-rank behavior with
multi-rank-single-node runs (SURVEY §4): sharding tests use an 8-device
virtual CPU mesh via XLA_FLAGS.

Note: in this environment jax is pre-imported at interpreter startup (the
axon sitecustomize), so env vars are too late — we must switch platform via
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The fast suite is COMPILE-dominated (refined-mesh geometries compile
# for minutes); the persistent compilation cache makes repeat runs hit
# disk — same mechanism the TPU path uses (.jax_cache).  Keyed on the
# HLO, so source edits that change traced code invalidate naturally.
os.makedirs("/root/repo/.jax_cache_cpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
