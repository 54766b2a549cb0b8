"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests validate
against XLA's CPU backend with 8 virtual devices (SURVEY.md §4 test strategy).

Note: this environment's axon sitecustomize force-sets JAX_PLATFORMS=axon at
interpreter start, so the env var is not enough — the platform must be forced
via jax.config before first backend use. XLA_FLAGS still must be set before
jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# e2e CLI tests call mains that enable the PERSISTENT compilation cache
# process-wide. On this host the cached CPU AOT artifacts come from the
# remote-compile helper, whose machine features (avx512 etc.) the local
# CPU lacks — loading them can SIGILL/abort the interpreter mid-suite
# (observed in test_ssl_pretrain_cli after test_e2e_cli primed the cache).
# Keep the suite on in-process compilation only.
os.environ["OMGSR_COMPILATION_CACHE"] = "0"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: full-architecture / multi-minute e2e drills "
        "(deselect for quick loops: -m 'not heavy')",
    )
