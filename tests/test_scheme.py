"""Scheme-layer integration KATs, mirroring the reference's per-op tests
(ref: tests/gpqhe.c: test_ecd:173, test_enc:246, test_add:295, test_mul:422,
test_conj:539, test_rot:593) at reduced parameters (logn=12, logq=109,
slots=4, Delta=2^30 — the reference's commented small config,
ref: tests/gpqhe.c:1296-1299) so CI stays fast.  Full logn=14 runs are in
test_full_params.py behind -m slow.

Pattern per op: sample message -> plaintext reference model in doubles ->
homomorphic computation -> decrypt -> max-norm diff < 1e-5
(ref: tests/gpqhe.c:167-171 CHECK_DIFF).
"""

import numpy as np
import pytest

from gpqhe_tpu.context import HeContext
from gpqhe_tpu.ring import sample as smp
from gpqhe_tpu.ring.canemb import canemb, invcanemb
from gpqhe_tpu.scheme.engine import CKKS
from gpqhe_tpu.substrate.surf import Surf

TOL = 1e-5


@pytest.fixture(scope="module")
def eng():
    ctx = HeContext(logn=12, q=1 << 109, slots=4, Delta=1 << 30)
    return CKKS(ctx, rng=Surf())


@pytest.fixture(scope="module")
def keys(eng):
    pk, sk = eng.keypair()
    rlk = eng.genrlk(sk)
    ck = eng.genck(sk)
    rk = eng.genrk(sk)
    return pk, sk, rlk, ck, rk


def msg(eng):
    return smp.sample_z01vec(eng.rng, eng.ctx.slots)


def dist(a, b):
    return float(np.max(np.abs(a - b)))


def test_canemb_roundtrip(eng):
    ctx = eng.ctx
    m0 = msg(eng)
    u = invcanemb(m0, ctx.slots, ctx.poly.cyc_group, ctx.poly.ring_zetas, ctx.poly.m)
    m1 = canemb(u, ctx.slots, ctx.poly.cyc_group, ctx.poly.ring_zetas, ctx.poly.m)
    assert dist(m1, m0) < TOL


def test_ecd_dcd(eng):
    m0 = msg(eng)
    assert dist(eng.dcd(eng.ecd(m0)), m0) < TOL


def test_ecd_product_norm(eng):
    """Plaintext-domain product via poly_mul (ref: tests/gpqhe.c:197-238)."""
    ctx = eng.ctx
    s = ctx.slots
    m1 = np.array([(1 - i / s) + 1j * (1 - i / s) for i in range(s)])
    m2 = np.array([(0.99 - i / s) + 1j * (0.99 - i / s) for i in range(s)])
    pt1 = eng.ecd(m1)
    pt2 = eng.ecd(m2)
    dim = (2 * ctx.q[ctx.L].bit_length()) // ctx.logp_prime + 1
    prod = eng.ring.poly_mul(pt1.m, pt2.m, dim, 32 * eng.kq, eng.kq,
                             signed_a=pt1.mod_bits, signed_b=pt2.mod_bits)
    from gpqhe_tpu.scheme.types import Plaintext
    pt = Plaintext(nu=pt1.nu * pt2.nu, m=prod, mod_bits=32 * eng.kq)
    assert dist(eng.dcd(pt), m1 * m2) < TOL


def test_enc_dec_sk_pk(eng, keys):
    pk, sk, *_ = keys
    m0 = msg(eng)
    pt = eng.ecd(m0)
    for ct in (eng.enc_sk(pt, sk), eng.enc_pk(pt, pk)):
        assert dist(eng.dcd(eng.dec(ct, sk)), m0) < TOL
        # moddown (ref: tests/gpqhe.c:280-285)
        ctm = eng.moddown(ct)
        assert ctm.l == ct.l - 1
        assert dist(eng.dcd(eng.dec(ctm, sk)), m0) < TOL


def test_add_variants(eng, keys):
    """ct+ct, ct-ct, ct+pt, ct-pt, -ct (ref: tests/gpqhe.c test_add:295)."""
    pk, sk, *_ = keys
    m1, m2 = msg(eng), msg(eng)
    ct1 = eng.enc_pk(eng.ecd(m1), pk)
    ct2 = eng.enc_pk(eng.ecd(m2), pk)
    pt2 = eng.ecd(m2)
    assert dist(eng.dcd(eng.dec(eng.add(ct1, ct2), sk)), m1 + m2) < TOL
    assert dist(eng.dcd(eng.dec(eng.sub(ct1, ct2), sk)), m1 - m2) < TOL
    assert dist(eng.dcd(eng.dec(eng.addpt(ct1, pt2), sk)), m1 + m2) < TOL
    assert dist(eng.dcd(eng.dec(eng.subpt(ct1, pt2), sk)), m1 - m2) < TOL
    assert dist(eng.dcd(eng.dec(eng.neg(ct1.copy()), sk)), -m1) < TOL


def test_mul_variants(eng, keys):
    """ct*ct + rescale, ct*pt, chained (ref: tests/gpqhe.c test_mul:422)."""
    pk, sk, rlk, *_ = keys
    m1, m2 = msg(eng), msg(eng)
    ct1 = eng.enc_pk(eng.ecd(m1), pk)
    ct2 = eng.enc_pk(eng.ecd(m2), pk)
    ctm = eng.rs(eng.mul(ct1, ct2, rlk))
    assert ctm.l == ct1.l - 1
    assert dist(eng.dcd(eng.dec(ctm, sk)), m1 * m2) < TOL
    # ct * pt
    ctp = eng.rs(eng.mulpt(ct1, eng.ecd(m2)))
    assert dist(eng.dcd(eng.dec(ctp, sk)), m1 * m2) < TOL
    # chain to a deeper level
    ct3 = eng.enc_pk(eng.ecd(m1), pk)
    ct3 = eng.moddown(ct3)
    ctmm = eng.rs(eng.mul(ctm, ct3, rlk))
    assert dist(eng.dcd(eng.dec(ctmm, sk)), m1 * m2 * m1) < TOL


def test_conj(eng, keys):
    """Conjugation via key switch (ref: tests/gpqhe.c test_conj:539)."""
    pk, sk, _, ck, _ = keys
    m0 = msg(eng)
    ct = eng.enc_pk(eng.ecd(m0), pk)
    ctc = eng.conj(ct, ck)
    assert dist(eng.dcd(eng.dec(ctc, sk)), np.conj(m0)) < TOL


def test_rot_all(eng, keys):
    """All slot rotations (ref: tests/gpqhe.c test_rot:593)."""
    pk, sk, _, _, rk = keys
    m0 = msg(eng)
    ct0 = eng.enc_pk(eng.ecd(m0), pk)
    s = eng.ctx.slots
    for r in range(s):
        ctr = eng.rot(ct0.copy(), r, rk)
        expect = np.concatenate([m0[r:], m0[:r]])
        assert dist(eng.dcd(eng.dec(ctr, sk)), expect) < TOL


def test_mul_rs_fused(eng, keys):
    """Fused mul_rs == mul followed by rs, bit-for-bit."""
    pk, sk, rlk, ck, rk = keys
    import jax.numpy as jnp
    m1 = smp.sample_z01vec(eng.rng, eng.ctx.slots)
    m2 = smp.sample_z01vec(eng.rng, eng.ctx.slots)
    ct1 = eng.enc_pk(eng.ecd(m1), pk)
    ct2 = eng.enc_pk(eng.ecd(m2), pk)
    sep = eng.rs(eng.mul(ct1, ct2, rlk))
    fus = eng.mul_rs(ct1, ct2, rlk)
    assert fus.l == sep.l
    assert jnp.array_equal(fus.c0, sep.c0)
    assert jnp.array_equal(fus.c1, sep.c1)


def test_mul_rs_batch_matches_single(eng, keys):
    """Batched fused mul_rs (one program, NTT poly-fold axis = 4B) ==
    per-element mul_rs, bit for bit (VERDICT r3 #7 throughput path)."""
    pk, sk, rlk, ck, rk = keys
    import jax.numpy as jnp
    B = 3
    cts1, cts2, refs = [], [], []
    for _ in range(B):
        a = eng.enc_pk(eng.ecd(smp.sample_z01vec(eng.rng, eng.ctx.slots)), pk)
        b = eng.enc_pk(eng.ecd(smp.sample_z01vec(eng.rng, eng.ctx.slots)), pk)
        cts1.append(a)
        cts2.append(b)
        refs.append(eng.mul_rs(a, b, rlk))
    outs = eng.mul_rs_batch(cts1, cts2, rlk)
    for i in range(B):
        assert outs[i].l == refs[i].l
        assert jnp.array_equal(outs[i].c0, refs[i].c0), f"c0[{i}]"
        assert jnp.array_equal(outs[i].c1, refs[i].c1), f"c1[{i}]"
        assert outs[i].nu == refs[i].nu and outs[i].B == refs[i].B
