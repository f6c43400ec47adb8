import os

# Force CPU with 8 virtual devices so sharding tests run anywhere.
# NOTE: this environment's sitecustomize registers a TPU ("axon") PJRT
# plugin that overrides the JAX_PLATFORMS env var, so we must also override
# via jax.config after import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# device regressions must fail tests loudly, not silently fall back to the
# host oracle (pomfret_tpu.kernels.engine_jax._host_fallback_group)
os.environ.setdefault("POMFRET_NO_HOST_FALLBACK", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
