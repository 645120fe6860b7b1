"""Bootstrapping: CoeffToSlot -> EvalSin -> SlotToCoeff.

Port of the reference's he-bootstrap.c live path (ref: src/he-bootstrap.c:299-546):
dense U0/U1 DFT matrices from the 5^i cyclic roots, coeff2slot/slot2coeff as
gemv compositions, rlsin via exp/conj, and the full modulus-raise pipeline.

Fixes a latent reference bug: he_coeff2slot scales by he_const_pt(&pt, 1/n)
where 1/n is C INTEGER division == 0 for n > 1 (ref: src/he-bootstrap.c:385);
the correct scale 1.0/n is used here (SURVEY.md §3.5)."""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np

from .. import params
from ..algo.linalg import GemvPlan, gemv
from ..algo.nonlinear import he_exp
from ..scheme.engine import CKKS
from ..scheme.types import Ciphertext, SwitchKey
from ..ops import limbs as lb
from ..substrate import bigint

import jax.numpy as jnp


class BootstrapContext:
    """U-matrix bank (ref: src/he-bootstrap.c:299-342) + gemv plans."""

    def __init__(self, eng: CKKS):
        ctx = eng.ctx
        slots = ctx.slots
        n, nh, m = ctx.poly.n, ctx.poly.n // 2, ctx.poly.m
        gap = nh // slots
        cyc = ctx.poly.cyc_group
        U0 = np.empty((slots, slots), dtype=np.complex128)
        U1 = np.empty((slots, slots), dtype=np.complex128)
        j = np.arange(slots)
        for i in range(slots):
            theta = 2 * params.PI * int(cyc[i * gap]) / m
            zeta = np.cos(theta) + 1j * np.sin(theta)
            U0[i] = zeta ** (j * gap)
            U1[i] = zeta ** (j * gap + nh)
        self.U0 = U0.reshape(-1)
        self.U1 = U1.reshape(-1)
        self.U0_T = U0.T.reshape(-1)
        self.U1_T = U1.T.reshape(-1)
        self.U0_conjT = np.conj(U0.T).reshape(-1)
        self.U1_conjT = np.conj(U1.T).reshape(-1)
        self.eng = eng
        self._plans: dict[str, GemvPlan] = {}

    def plan(self, name: str) -> GemvPlan:
        if name not in self._plans:
            self._plans[name] = GemvPlan(self.eng, getattr(self, name))
        return self._plans[name]


@contextmanager
def raised_delta(eng: CKKS, new_delta: float):
    """Temporarily raise the metadata scaling factor, like the reference's
    mutation of hectx.Delta (ref: src/he-bootstrap.c:510-516,543-545).
    The rescale SHIFT (by 2^logDelta) is unaffected — only encode scale and
    the nu ledger change."""
    old = eng.ctx.Delta
    eng.ctx.Delta = float(new_delta)
    try:
        yield
    finally:
        eng.ctx.Delta = old


def raise_modulus(eng: CKKS, ct: Ciphertext) -> Ciphertext:
    """Reinterpret ct mod q_l as mod q_L: center the value mod q_l, then
    sign-extend into the top-level width (ref: src/he-bootstrap.c:513-516 —
    trivial there because coefficients are centered MPIs)."""
    ctx = eng.ctx
    logql = ctx.q[ct.l].bit_length() - 1
    kq = eng.kq
    ql_limbs = jnp.asarray(bigint.int_to_limbs(ctx.q[ct.l], kq))

    def fix(c):
        mbits = lb.mask_bits(lb.resize(c, kq), logql)
        hb_limb, hb_bit = divmod(logql - 1, 32)
        negmask = ((mbits[..., hb_limb] >> jnp.uint32(hb_bit)) & jnp.uint32(1)) == 1
        wrapped = lb.sub(mbits, jnp.broadcast_to(ql_limbs, mbits.shape))
        return lb.mask_bits(lb.select(negmask, wrapped, mbits),
                            ctx.q[ctx.L].bit_length())
    return Ciphertext(l=ctx.L, nu=float(ctx.q[ctx.L]), B=ct.B,
                      c0=fix(ct.c0), c1=fix(ct.c1))


def coeff2slot(eng: CKKS, bctx: BootstrapContext, ct: Ciphertext,
               ck: SwitchKey, rk: dict[int, SwitchKey]) -> tuple[Ciphertext, Ciphertext]:
    """ct_real/imag = (U^dag ct +- U^T conj(ct)) / n (ref: src/he-bootstrap.c:358-408)."""
    n = eng.ctx.poly.n
    pt = eng.const_pt(1.0 / n)  # reference writes integer 1/n == 0 here (bug)
    ct_conj = eng.conj(ct.copy(), ck)
    ct0 = gemv(eng, None, ct, rk, plan=bctx.plan("U0_conjT"))
    ct1 = gemv(eng, None, ct_conj, rk, plan=bctx.plan("U0_T"))
    ct_real = eng.rs(eng.mulpt(eng.add(ct0, ct1), pt))
    ct0 = gemv(eng, None, ct, rk, plan=bctx.plan("U1_conjT"))
    ct1 = gemv(eng, None, ct_conj, rk, plan=bctx.plan("U1_T"))
    ct_imag = eng.rs(eng.mulpt(eng.add(ct0, ct1), pt))
    return ct_real, ct_imag


def slot2coeff(eng: CKKS, bctx: BootstrapContext, ct0: Ciphertext,
               ct1: Ciphertext, rk: dict[int, SwitchKey]) -> Ciphertext:
    """ct = U0 ct0 + U1 ct1 (ref: src/he-bootstrap.c:414-437)."""
    u0 = gemv(eng, None, ct0, rk, plan=bctx.plan("U0"))
    u1 = gemv(eng, None, ct1, rk, plan=bctx.plan("U1"))
    return eng.add(u0, u1)


def rlsin(eng: CKKS, a: float, ct: Ciphertext, rlk: SwitchKey, ck: SwitchKey,
          iter: int) -> Ciphertext:
    """sin(a ct)/a = (e^{ia ct} - e^{-ia ct}) / (2ia) (ref: src/he-bootstrap.c:444-475)."""
    slots = eng.ctx.slots
    ct_exp = he_exp(eng, a * 1j, ct, rlk, iter)
    ct_exp_neg = eng.conj(ct_exp.copy(), ck)
    out = eng.sub(ct_exp, ct_exp_neg)
    b = 1.0 / (2j * a)
    pt = eng.ecd(np.full(slots, b, dtype=np.complex128))
    return eng.rs(eng.mulpt(out, pt))


def bootstrap(eng: CKKS, bctx: BootstrapContext, ct: Ciphertext,
              rlk: SwitchKey, ck: SwitchKey, rk: dict[int, SwitchKey],
              iter: int) -> Ciphertext:
    """Full pipeline: raise -> c2s -> rlsin(2pi) -> s2c -> rs
    (ref: src/he-bootstrap.c:477-546)."""
    ctx = eng.ctx
    ct = raise_modulus(eng, ct)
    with raised_delta(eng, float(ctx.q[ctx.L])):
        ct0, ct1 = coeff2slot(eng, bctx, ct, ck, rk)
        a = 2 * params.PI
        ct0 = rlsin(eng, a, ct0, rlk, ck, iter)
        ct1 = rlsin(eng, a, ct1, rlk, ck, iter)
        ct = slot2coeff(eng, bctx, ct0, ct1, rk)
        ct = eng.rs(ct)
    ct.nu = ctx.Delta
    return ct
