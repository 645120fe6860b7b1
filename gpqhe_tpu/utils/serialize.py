"""Checkpoint/serialization for keys and ciphertexts.

The reference has NO serialization — keys and ciphertexts die with the
process (SURVEY.md §5; kemctx byte sizes are computed at src/precomp.c:455-463
but never used for I/O).  A usable framework needs persistence, so this module
saves/loads every scheme object as .npz plus a params header for validation.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from ..context import HeContext
from ..scheme.types import Ciphertext, Plaintext, PublicKey, SecretKey, SwitchKey


def _header(ctx: HeContext) -> str:
    return json.dumps({
        "logn": ctx.poly.logn,
        "logq": ctx.poly.logq,
        "slots": ctx.slots,
        "logDelta": ctx.p.bit_length() - 1,
    })


def _check_header(ctx: HeContext, hdr: str) -> None:
    want = json.loads(_header(ctx))
    got = json.loads(hdr)
    if want != got:
        raise ValueError(f"context mismatch: file={got} ctx={want}")


def save(path: str, ctx: HeContext, obj) -> None:
    arrs = {"header": np.array(_header(ctx))}
    if isinstance(obj, Ciphertext):
        arrs.update(kind=np.array("ct"), c0=np.asarray(obj.c0), c1=np.asarray(obj.c1),
                    meta=np.array([obj.l, obj.nu, obj.B], dtype=np.float64))
    elif isinstance(obj, Plaintext):
        arrs.update(kind=np.array("pt"), m=np.asarray(obj.m),
                    meta=np.array([obj.nu, obj.mod_bits], dtype=np.float64))
    elif isinstance(obj, PublicKey):
        arrs.update(kind=np.array("pk"), p0=np.asarray(obj.p0), p1=np.asarray(obj.p1))
    elif isinstance(obj, SecretKey):
        arrs.update(kind=np.array("sk"), s=np.asarray(obj.s))
    elif isinstance(obj, SwitchKey):
        arrs.update(kind=np.array("swk"), p0hat=np.asarray(obj.p0hat),
                    p1hat=np.asarray(obj.p1hat))
    elif isinstance(obj, dict):  # rotation-key bank
        arrs.update(kind=np.array("rk"), rots=np.array(sorted(obj.keys())))
        for r, swk in obj.items():
            arrs[f"p0hat_{r}"] = np.asarray(swk.p0hat)
            arrs[f"p1hat_{r}"] = np.asarray(swk.p1hat)
    else:
        raise TypeError(type(obj))
    np.savez_compressed(path, **arrs)


def load(path: str, ctx: HeContext):
    z = np.load(path, allow_pickle=False)
    _check_header(ctx, str(z["header"]))
    kind = str(z["kind"])
    if kind == "ct":
        l, nu, B = z["meta"]
        return Ciphertext(l=int(l), nu=float(nu), B=float(B),
                          c0=jnp.asarray(z["c0"]), c1=jnp.asarray(z["c1"]))
    if kind == "pt":
        nu, mod_bits = z["meta"]
        return Plaintext(nu=float(nu), m=jnp.asarray(z["m"]), mod_bits=int(mod_bits))
    if kind == "pk":
        return PublicKey(p0=jnp.asarray(z["p0"]), p1=jnp.asarray(z["p1"]))
    if kind == "sk":
        return SecretKey(s=jnp.asarray(z["s"]))
    if kind == "swk":
        return SwitchKey(p0hat=jnp.asarray(z["p0hat"]), p1hat=jnp.asarray(z["p1hat"]))
    if kind == "rk":
        return {int(r): SwitchKey(p0hat=jnp.asarray(z[f"p0hat_{int(r)}"]),
                                  p1hat=jnp.asarray(z[f"p1hat_{int(r)}"]))
                for r in z["rots"]}
    raise ValueError(kind)
