"""Pallas NTT kernel tests (interpret mode — exact kernel code paths, CPU).

The kernel's twiddle order matches ops/ntt.py bit-for-bit (ref: src/ntt.c:
37-73), so every check is exact equality against the butterfly backend.
Covers the P-poly fold (row = r*P + j layout), fold splitting through
RingEngine, and an end-to-end scheme multiply on the pallas backend.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpqhe_tpu.context import PolyContext
from gpqhe_tpu.ops import ntt_pallas as ntp
from gpqhe_tpu.ops import rns as rns_ops
from gpqhe_tpu.ops.ntt import intt, ntt
from gpqhe_tpu.ring.poly import RingEngine

LOGN, DIM = 11, 3
N = 1 << LOGN


@pytest.fixture(autouse=True)
def _interpret_mode():
    ntp.INTERPRET = True
    yield
    ntp.INTERPRET = False


@pytest.fixture(scope="module")
def ring():
    pctx = PolyContext(LOGN, q=1 << 54, dim_cap=DIM)
    return pctx, rns_ops.make_basis_arrays(pctx, DIM)


def _rand(pctx, P):
    rng = np.random.default_rng(7)
    a = np.stack([
        np.stack([rng.integers(0, p, N, dtype=np.uint64)
                  for p in pctx.primes[:DIM]])
        for _ in range(P)])
    return jnp.asarray(a)


@pytest.mark.parametrize("P", [1, 4])
@pytest.mark.parametrize("inverse", [False, True])
def test_fold_matches_butterfly(ring, P, inverse):
    pctx, ba = ring
    a = _rand(pctx, P)
    if P == 1:
        a = a[0]
    if inverse:
        ref = intt(a, ba.zetas_inv, ba.ps, ba.pinv, ba.ninv_mont)
    else:
        ref = ntt(a, ba.zetas, ba.ps, ba.pinv)
    plan = ntp.make_pallas_plan(pctx, DIM, P=P)
    got = ntp.ntt_pallas(a, plan, inverse=inverse)
    assert jnp.array_equal(ref, got)


def test_engine_fold_split(ring):
    """A stack larger than the VMEM fold budget splits into grouped calls."""
    pctx, ba = ring
    class SmallBudgetEngine(RingEngine):
        _pallas_fold_budget = 2 * N  # force fold cap = 2 (shadows the property)

    eng = SmallBudgetEngine(pctx, ntt_impl="pallas")
    assert eng.pallas_fold(4) == 2
    assert eng.pallas_fold(3) == 1
    a = _rand(pctx, 4)
    ref = ntt(a, ba.zetas, ba.ps, ba.pinv)
    got = eng.ntt_f(a, DIM)
    assert jnp.array_equal(ref, got)
    refi = intt(a, ba.zetas_inv, ba.ps, ba.pinv, ba.ninv_mont)
    goti = eng.ntt_i(a, DIM)
    assert jnp.array_equal(refi, goti)


def test_scheme_mul_pallas_backend():
    """encode -> encrypt -> mul+relin -> rescale -> decrypt on the pallas
    backend (folded fwd x4 / inv x3 / keyswitch-pair NTTs).  Both backends
    share the butterfly evaluation order, so the pallas ciphertext must be
    BIT-IDENTICAL to the butterfly one; the decoded message is additionally
    sanity-checked at the small-Delta precision budget."""
    from gpqhe_tpu.context import HeContext
    from gpqhe_tpu.ring import sample as smp
    from gpqhe_tpu.scheme.engine import CKKS
    from gpqhe_tpu.substrate.surf import Surf

    ctx = HeContext(logn=11, q=1 << 48, slots=4, Delta=1 << 22)
    cts = {}
    for impl in ("pallas", "butterfly"):
        eng = CKKS(ctx, rng=Surf(), ntt_impl=impl)
        pk, sk = eng.keypair()
        rlk = eng.genrlk(sk)
        m1 = smp.sample_z01vec(eng.rng, ctx.slots)
        m2 = smp.sample_z01vec(eng.rng, ctx.slots)
        ct1 = eng.enc_pk(eng.ecd(m1), pk)
        ct2 = eng.enc_pk(eng.ecd(m2), pk)
        ct = eng.rs(eng.mul(ct1, ct2, rlk))
        cts[impl] = ct
        out = eng.dcd(eng.dec(ct, sk))
        assert np.max(np.abs(out - m1 * m2)) < 1e-3  # Delta=2^22 budget
    assert jnp.array_equal(cts["pallas"].c0, cts["butterfly"].c0)
    assert jnp.array_equal(cts["pallas"].c1, cts["butterfly"].c1)
