"""Bootstrap tests.

test_coeff2slot mirrors the reference's test exactly (ref:
tests/gpqhe.c:1096-1154): message m0/Delta, NO modulus raise, c2s output
slots must equal the encode coefficients Re/Im(invcanemb(m))*Delta.

test_full_bootstrap exercises the corrected full pipeline (the reference's
raise-Delta-to-qL flow is untested there and overflows the modulus — see
bootstrap/__init__.py): a ciphertext at a low level comes back to a high
level with its message intact.

Tiny ring (logn=5) with the security-table bypass keeps every compile small;
the ladder depth comes from logq.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # many per-level compiles

from gpqhe_tpu import bootstrap as bs
from gpqhe_tpu.context import HeContext
from gpqhe_tpu.ring import sample as smp
from gpqhe_tpu.ring.canemb import invcanemb
from gpqhe_tpu.scheme.engine import CKKS
from gpqhe_tpu.substrate.surf import Surf


def test_coeff2slot():
    """c2s slots == encode coefficients (the reference's test shape,
    ref: tests/gpqhe.c:1110-1144; that test divides the message by Delta,
    which makes every encode coefficient round to 0 and the comparison
    unsatisfiable as written — here the message stays O(1) and the expected
    slots are the exactly-rounded coefficients, with a Delta-relative
    tolerance)."""
    ctx = HeContext(logn=5, q=1 << 400, slots=4, Delta=1 << 30)
    eng = CKKS(ctx, rng=Surf())
    pk, sk = eng.keypair()
    ck = eng.genck(sk)
    rk = eng.genrk(sk)
    Delta = ctx.Delta
    m0 = smp.sample_z01vec(eng.rng, ctx.slots)
    pt = eng.ecd(m0)
    u = invcanemb(m0, ctx.slots, ctx.poly.cyc_group, ctx.poly.ring_zetas,
                  ctx.poly.m)
    mr0 = np.round(u.real * Delta) / Delta   # exact encode coeffs / Delta
    mi0 = np.round(u.imag * Delta) / Delta   # (c2s ledger decodes to t/Delta)
    ct = eng.enc_pk(pt, pk)
    bctx = bs.BootstrapContext(eng)
    ct0, ct1 = bs.coeff2slot(eng, bctx, ct, ck, rk)
    mr = eng.dcd(eng.dec(ct0, sk))
    mi = eng.dcd(eng.dec(ct1, sk))
    assert np.max(np.abs(mr - mr0)) < 1e-5
    assert np.max(np.abs(mi - mi0)) < 1e-5


def test_full_bootstrap():
    ctx = HeContext(logn=5, q=1 << 800, slots=4, Delta=1 << 30)
    eng = CKKS(ctx, rng=Surf())
    pk, sk = eng.keypair()
    rlk = eng.genrlk(sk)
    ck = eng.genck(sk)
    rk = eng.genrk(sk)
    m0 = smp.sample_z01vec(eng.rng, ctx.slots) * 0.1
    ct = eng.enc_pk(eng.ecd(m0), pk)
    # burn down to a low level, as after a deep computation
    while ct.l > 1:
        ct = eng.moddown(ct)
    assert ct.l == 1
    bctx = bs.BootstrapContext(eng)
    # 2^iter >~ 4*pi*(h/2+1) = ~113 for the tiny ring's h=16 -> iter=7
    ct_boot = bs.bootstrap(eng, bctx, ct, rlk, ck, rk, iter=7)
    assert ct_boot.l > ct.l + 3, "bootstrap must regain levels"
    got = eng.dcd(eng.dec(ct_boot, sk))
    assert np.max(np.abs(got - m0)) < 1e-2, np.max(np.abs(got - m0))
