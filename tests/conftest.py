"""Test harness config: force CPU with 8 virtual devices for mesh tests.

Mirrors the reference's deterministic-KAT philosophy (ref: README.md:48,
src/rng.c:32-78): everything derives from the surf stream, so tests are
reproducible bit for bit.  Multi-device tests run on a virtual CPU mesh
(the "fake backend" analogue, SURVEY.md §4).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The session environment may pin JAX_PLATFORMS to the real TPU; tests always
# run on the virtual CPU mesh, so override unconditionally (both the env var
# and the config flag — the TPU plugin can win over the env var alone).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: scheme-op programs are large (u64 emulation),
# ~10-20s each to compile; cache makes repeated test runs fast.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

import gpqhe_tpu  # noqa: E402,F401  (enables x64 before any jax use)


@pytest.fixture(autouse=True)
def _fresh_rng():
    """Reset the process-global surf stream per test, like a fresh C process."""
    from gpqhe_tpu.substrate import surf
    surf.reset_default_rng()
    yield
    surf.reset_default_rng()
