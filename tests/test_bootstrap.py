"""Bootstrap pipeline tests on a tiny deep-ladder ring.

The reference only tests coeff2slot and rlsin in isolation (its
test_bootstrap is a stub, ref: tests/gpqhe.c:1259-1275); here the FULL
raise -> c2s -> rlsin -> s2c -> rs cycle runs end-to-end: a ciphertext at a
low level comes back to a high level with its message intact.

Uses logn=5 with the security-table bypass (ref: src/precomp.c:339-340) so
the ladder is deep (L=13) while compiles stay small.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # dozens of per-level compiles; see CLAUDE.md

from gpqhe_tpu import bootstrap as bs
from gpqhe_tpu.context import HeContext
from gpqhe_tpu.ring import sample as smp
from gpqhe_tpu.scheme.engine import CKKS
from gpqhe_tpu.substrate.surf import Surf


@pytest.fixture(scope="module")
def eng():
    ctx = HeContext(logn=5, q=1 << 400, slots=4, Delta=1 << 30)
    return CKKS(ctx, rng=Surf())


@pytest.fixture(scope="module")
def keys(eng):
    pk, sk = eng.keypair()
    rlk = eng.genrlk(sk)
    ck = eng.genck(sk)
    rk = eng.genrk(sk)
    return pk, sk, rlk, ck, rk


def test_coeff2slot_roundtrip(eng, keys):
    """c2s followed by s2c reproduces the ciphertext (up to scheme noise):
    slot2coeff(U0 ct0 + U1 ct1) inverts coeff2slot by construction
    (ref: src/he-bootstrap.c:354-437)."""
    pk, sk, rlk, ck, rk = keys
    ctx = eng.ctx
    m0 = smp.sample_z01vec(eng.rng, ctx.slots)
    ct = eng.enc_pk(eng.ecd(m0), pk)
    bctx = bs.BootstrapContext(eng)
    with bs.raised_delta(eng, float(ctx.q[ct.l])):
        # stay at the ct's own level: treat current modulus as the ceiling
        ct_r = ct.copy()
        ct_r.nu = eng.ctx.Delta
        ct0, ct1 = bs.coeff2slot(eng, bctx, ct_r, ck, rk)
        out = bs.slot2coeff(eng, bctx, ct0, ct1, rk)
    out.nu = ct.nu / 2 ** ((ct.l - out.l) * 30)  # levels consumed scale nu back
    # decode at the ORIGINAL Delta: message must survive the round trip
    out.nu = float(1 << 30)
    got = eng.dcd(eng.dec(out, sk))
    assert np.max(np.abs(got - m0)) < 1e-3


def test_full_bootstrap(eng, keys):
    pk, sk, rlk, ck, rk = keys
    ctx = eng.ctx
    m0 = smp.sample_z01vec(eng.rng, ctx.slots) * 0.1
    ct = eng.enc_pk(eng.ecd(m0), pk)
    # burn down to a low level, as after a deep computation
    while ct.l > 1:
        ct = eng.moddown(ct)
    assert ct.l == 1
    bctx = bs.BootstrapContext(eng)
    ct_boot = bs.bootstrap(eng, bctx, ct, rlk, ck, rk, iter=3)
    assert ct_boot.l > ct.l + 3, "bootstrap must regain levels"
    got = eng.dcd(eng.dec(ct_boot, sk))
    assert np.max(np.abs(got - m0)) < 1e-2, np.max(np.abs(got - m0))
