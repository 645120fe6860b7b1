"""Algorithm-layer KATs: gemv/sum/idx/nrm2 and nonlinear evaluators.

Mirrors the reference tests (ref: tests/gpqhe.c test_gemv:641, test_sum:686,
test_idx:734, test_nrm2:779, test_inv:840, test_exp:888, test_sigmoid:931,
test_log:973, test_cmp:1021, test_sqrt:1202) at reduced depth
(logn=13, logq=218 — one row down the security table, ref: src/precomp.c:57-64)
with smaller iteration counts so CI depth fits L=7.
"""

import numpy as np
import pytest

from gpqhe_tpu.algo import linalg, nonlinear
from gpqhe_tpu.context import HeContext
from gpqhe_tpu.ring import sample as smp
from gpqhe_tpu.scheme.engine import CKKS
from gpqhe_tpu.substrate.surf import Surf

TOL = 1e-5


@pytest.fixture(scope="module")
def eng():
    ctx = HeContext(logn=13, q=1 << 218, slots=4, Delta=1 << 30)
    return CKKS(ctx, rng=Surf())


@pytest.fixture(scope="module")
def keys(eng):
    pk, sk = eng.keypair()
    rlk = eng.genrlk(sk)
    ck = eng.genck(sk)
    rk = eng.genrk(sk)
    return pk, sk, rlk, ck, rk


def dist(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def plain_gemv(A, v, slots):
    A = np.asarray(A).reshape(slots, slots)
    return A @ v


def test_gemv(eng, keys):
    pk, sk, _, _, rk = keys
    s = eng.ctx.slots
    m0 = smp.sample_z01vec(eng.rng, s)
    A = smp.sample_z01vec(eng.rng, s * s)
    ct = eng.enc_pk(eng.ecd(m0), pk)
    out = linalg.gemv(eng, A, ct, rk)
    assert dist(eng.dcd(eng.dec(out, sk)), plain_gemv(A, m0, s)) < TOL


def test_sum_idx_nrm2(eng, keys):
    pk, sk, rlk, ck, rk = keys
    s = eng.ctx.slots
    m0 = smp.sample_z01vec(eng.rng, s)
    ct = eng.enc_pk(eng.ecd(m0), pk)
    # sum lands the total in the row-0 slot (ref: src/he-algo.c:95-103)
    out = linalg.he_sum(eng, ct, rk)
    got = eng.dcd(eng.dec(out, sk))
    assert abs(got[0] - np.sum(m0)) < TOL
    # idx extracts one slot
    out = linalg.he_idx(eng, ct, 2, rk)
    got = eng.dcd(eng.dec(out, sk))
    assert abs(got[2] - m0[2]) < TOL
    # nrm2 = sum |m|^2
    out = linalg.he_nrm2(eng, ct, rlk, ck, rk)
    got = eng.dcd(eng.dec(out, sk))
    assert abs(got[0] - np.sum(np.abs(m0) ** 2)) < TOL


def plain_inv(x, iter):
    an = 2 - x
    bn = 1 - x
    for _ in range(iter):
        bn = bn * bn
        an = an * (bn + 1)
    return an


def test_inv(eng, keys):
    """Goldschmidt inverse vs the same plaintext iteration
    (ref: tests/gpqhe.c:840-886 checks HE against the iteration, not 1/x)."""
    pk, sk, rlk, _, _ = keys
    s = eng.ctx.slots
    iter = 3
    m0 = smp.sample_z01vec(eng.rng, s).real + 0.2  # keep away from 0
    m0 = np.minimum(m0, 0.95).astype(np.complex128)
    ct = eng.enc_pk(eng.ecd(m0), pk)
    out = nonlinear.he_inv(eng, ct, rlk, iter)
    got = eng.dcd(eng.dec(out, sk))
    # Delta=2^30 noise floor after a depth-7 chain sits right at 1e-5
    # (the reference's nonlinear configs carry the same floor); allow 5e-5.
    assert dist(got, plain_inv(m0, iter)) < 5e-5


def test_sqrt(eng, keys):
    pk, sk, rlk, _, _ = keys
    s = eng.ctx.slots
    m0 = (smp.sample_z01vec(eng.rng, s).real * 0.5 + 0.3).astype(np.complex128)
    ct = eng.enc_pk(eng.ecd(m0), pk)
    out = nonlinear.he_sqrt(eng, ct, rlk, iter=2)
    got = eng.dcd(eng.dec(out, sk))
    # 2 Wilkes iterations: compare against the same plaintext iteration
    an, bn = m0.copy(), m0 - 1
    for _ in range(2):
        an = an * (1 - bn / 2)
        bn = bn * bn * (bn - 3) / 4
    assert dist(got, an) < TOL


def test_exp(eng, keys):
    pk, sk, rlk, _, _ = keys
    s = eng.ctx.slots
    m0 = (smp.sample_z01vec(eng.rng, s).real * 0.5).astype(np.complex128)
    ct = eng.enc_pk(eng.ecd(m0), pk)
    out = nonlinear.he_exp(eng, 1.0, ct, rlk, iter=2)
    got = eng.dcd(eng.dec(out, sk))
    assert dist(got, np.exp(m0)) < 1e-3  # Taylor-7 at iter=2 truncation level


def test_sigmoid(eng, keys):
    pk, sk, rlk, _, _ = keys
    s = eng.ctx.slots
    m0 = (smp.sample_z01vec(eng.rng, s).real * 2 - 1).astype(np.complex128)
    ct = eng.enc_pk(eng.ecd(m0), pk)
    out = nonlinear.he_sigmoid(eng, ct, rlk)
    got = eng.dcd(eng.dec(out, sk))
    assert dist(got, 1 / (1 + np.exp(-m0))) < 1e-3  # poly approx error dominates


def test_log(eng, keys):
    pk, sk, rlk, _, _ = keys
    s = eng.ctx.slots
    m0 = (smp.sample_z01vec(eng.rng, s).real * 0.2 + 0.9).astype(np.complex128)
    ct = eng.enc_pk(eng.ecd(eng_input := m0 - 1), pk)  # evaluator computes log(1+x)
    out = nonlinear.he_log(eng, ct, rlk)
    got = eng.dcd(eng.dec(out, sk))
    assert dist(got, np.log(m0)) < 1e-3


def test_rlsin(eng, keys):
    """sin(a*ct)/a via exp/conj (ref: tests/gpqhe.c test_rlsin:1156)."""
    from gpqhe_tpu.bootstrap import rlsin

    pk, sk, rlk, ck, _ = keys
    s = eng.ctx.slots
    m0 = (smp.sample_z01vec(eng.rng, s).real * 0.2).astype(np.complex128)
    ct = eng.enc_pk(eng.ecd(m0), pk)
    out = rlsin(eng, 2 * np.pi, ct, rlk, ck, iter=1)
    got = eng.dcd(eng.dec(out, sk))
    assert dist(got, np.sin(2 * np.pi * m0) / (2 * np.pi)) < 1e-3


def test_cmp(eng, keys):
    """Comparison at reduced iterations (ref: tests/gpqhe.c test_cmp:1021)."""
    pk, sk, rlk, _, _ = keys
    s = eng.ctx.slots
    a = np.array([0.55, 0.40, 0.52, 0.47], dtype=np.complex128)
    b = np.array([0.45, 0.60, 0.48, 0.53], dtype=np.complex128)
    ct1 = eng.enc_pk(eng.ecd(a), pk)
    ct2 = eng.enc_pk(eng.ecd(b), pk)
    out = nonlinear.he_cmp(eng, ct1, ct2, rlk, iter=2, alpha=1)
    got = eng.dcd(eng.dec(out, sk)).real
    expect = np.array([1.0, 0.0, 1.0, 0.0])
    assert np.all(np.abs(np.round(got) - expect) == 0)


def test_gemv_hoisted(eng, keys):
    """Double-hoisted gemv agrees with the classic path and the plaintext
    oracle (one key switch per giant step; CKKS.hoisted_gemv_fn)."""
    from gpqhe_tpu.algo.linalg import HoistedGemvPlan

    e, pk, sk, rlk, ck, rk = eng, *keys
    slots = e.ctx.slots
    rng = np.random.default_rng(17)
    A = (rng.standard_normal(slots * slots)
         + 1j * rng.standard_normal(slots * slots)) * 0.3
    m = smp.sample_z01vec(e.rng, slots)
    ct = e.enc_pk(e.ecd(m), pk)
    ref = A.reshape(slots, slots) @ m
    plan = HoistedGemvPlan(e, A)
    got = e.dcd(e.dec(linalg.gemv(e, A, ct, rk, plan=plan, hoisted=True), sk))
    assert np.max(np.abs(got - ref)) < 1e-5
    classic = e.dcd(e.dec(linalg.gemv(e, A, ct, rk), sk))
    assert np.max(np.abs(got - classic)) < 1e-5
    # plan reuse: second call hits the cached per-level pack
    got2 = e.dcd(e.dec(linalg.gemv(e, A, ct, rk, plan=plan, hoisted=True), sk))
    assert np.max(np.abs(got2 - ref)) < 1e-5


def test_sum_hoisted(eng, keys):
    e, pk, sk, rlk, ck, rk = eng, *keys
    slots = e.ctx.slots
    m = smp.sample_z01vec(e.rng, slots)
    ct = e.enc_pk(e.ecd(m), pk)
    got = e.dcd(e.dec(linalg.he_sum(e, ct, rk, hoisted=True), sk))
    assert abs(got[0] - m.sum()) < 1e-5
