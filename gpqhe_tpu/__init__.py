"""gpqhe_tpu — TPU-native CKKS homomorphic-encryption framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the reference
GPQHE library (pure-C, ref: /root/reference).  See SURVEY.md for the layer map
this package implements.

64-bit integer support must be enabled before any array op; XLA emulates u64
on TPU via u32 pairs.
"""

import os as _os

import jax as _jax

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # The session may default to another backend (e.g. the axon TPU tunnel)
    # in a way the env var alone does not override once the backend
    # initializes; honor an explicit JAX_PLATFORMS=cpu before first use.
    _jax.config.update("jax_platforms", "cpu")
_jax.config.update("jax_enable_x64", True)

from .context import HeContext, PolyContext  # noqa: E402,F401
from .scheme.engine import CKKS  # noqa: E402,F401
from .scheme.types import (  # noqa: E402,F401
    Ciphertext, Plaintext, PublicKey, SecretKey, SwitchKey)
