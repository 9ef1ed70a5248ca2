"""Test harness: force an 8-device CPU mesh so multi-chip sharding paths run
without TPU hardware (SURVEY.md section 4 'multi-node without a cluster').

Note: this container's sitecustomize registers the axon TPU plugin and pins
``jax_platforms=axon`` at interpreter start, so the JAX_PLATFORMS env var is
not enough -- we must override via jax.config after import, before first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, jax.devices()

# Persistent compilation cache (core/compile_cache.py): XLA-CPU compiles
# dominate the suite's wall clock (UNet/VAE/CLIP/ViT programs recompile every
# run); with the cache the per-commit fast pass only pays for programs whose
# HLO actually changed. Cache keys include the platform, so CPU test entries
# coexist with the chip entries bench.py writes.
from garmentdreamer_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
