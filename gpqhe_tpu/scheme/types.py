"""CKKS object types: plaintext, ciphertext, keys.

Mirrors the reference's data model (ref: src/gpqhe.h:72-97): ciphertexts carry
(level l, message norm nu, noise bound B) metadata host-side; polynomial data
lives on device as u32-limb tensors.  Evaluation keys are the only objects
kept permanently in the NTT/RNS domain (ref: src/he-kem.c:103-110), stored at
dimswk limbs (the reference's dimevk allocation under-sizes relinearization by
one limb at top level — see context.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass
class Plaintext:
    """nu = encode scale (decode divides by it); m = limb tensor [n, K],
    two's complement mod 2^mod_bits (ref: struct he_pt, src/gpqhe.h:93-97).

    bound = max |coefficient| (for RNS dimension sizing in mulpt — the
    reference sizes by nu and silently under-sizes for messages > 1,
    ref: src/he-mult.c:168).  None means nu."""
    nu: float
    m: jnp.ndarray
    mod_bits: int
    bound: float | None = None

    @property
    def size_bound(self) -> float:
        return self.nu if self.bound is None else max(self.nu, self.bound)


@dataclass
class Ciphertext:
    """(l, nu, B) + c0, c1 limb tensors [n, K_l] holding nonnegative
    representatives mod 2^nbits(q_l) (ref: struct he_ct, src/gpqhe.h:84-91)."""
    l: int
    nu: float
    B: float
    c0: jnp.ndarray
    c1: jnp.ndarray

    def copy(self) -> "Ciphertext":
        return Ciphertext(self.l, self.nu, self.B, self.c0, self.c1)


@dataclass
class PublicKey:
    """(p0, p1) limb tensors [n, K_L] (ref: struct he_pk, src/gpqhe.h:72-76)."""
    p0: jnp.ndarray
    p1: jnp.ndarray


@dataclass
class SecretKey:
    """Ternary hwt-64 key as signed limbs [n, 1] (ref: sample_sk, src/sample.c:102)."""
    s: jnp.ndarray


@dataclass
class SwitchKey:
    """Key-switching key, NTT-resident over the dimswk-prime basis:
    u64[dimswk, n] per half (ref: struct he_evk, src/gpqhe.h:78-82)."""
    p0hat: jnp.ndarray
    p1hat: jnp.ndarray
