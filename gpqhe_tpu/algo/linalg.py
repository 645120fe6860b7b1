"""Homomorphic linear algebra: BSGS gemv, sum, idx, nrm2.

Ports of the reference's he-algo.c linear-transform layer
(ref: src/he-algo.c:29-124).  These compose only public scheme ops — a clean
"client program" layer (SURVEY.md §1 L4).

Difference from the reference: the rotated-diagonal plaintexts of a given
matrix are encoded once per (matrix, call) and reusable via `GemvPlan`
(the reference re-encodes every diagonal on every call,
ref: src/he-algo.c:70-73 — SURVEY.md §7.5 hoisting).
"""

from __future__ import annotations

import math

import numpy as np

from ..scheme.engine import CKKS
from ..scheme.types import Ciphertext, Plaintext, SwitchKey


def zrotdiag(A: np.ndarray, idx: int, rot: int, m: int) -> np.ndarray:
    """Rotated generalized diagonal of the slots x slots matrix A
    (ref: src/he-algo.c:29-43)."""
    i = np.arange(m)
    diag = A[(i % m) * m + (idx + i) % m]
    rotidx = (i + rot) % m
    return diag[rotidx]


class GemvPlan:
    """Pre-encoded diagonals of one matrix for repeated gemv calls."""

    def __init__(self, eng: CKKS, A: np.ndarray):
        slots = eng.ctx.slots
        A = np.asarray(A, dtype=np.complex128).reshape(-1)
        assert A.shape[0] == slots * slots
        n1 = int(math.isqrt(slots))
        if n1 * n1 != slots:
            n1 = int(math.isqrt(2 * slots))
        self.n1 = n1                      # giant step (ref: src/he-algo.c:51-53)
        self.n2 = slots // n1             # baby step
        self.pts: dict[tuple[int, int], Plaintext] = {}
        for i in range(self.n2):
            shift = i * self.n1
            for j in range(self.n1):
                rd = zrotdiag(A, shift + j, -shift, slots)
                self.pts[(i, j)] = eng.ecd(rd)


def gemv(eng: CKKS, A, ct: Ciphertext, rk: dict[int, SwitchKey],
         plan: GemvPlan | None = None, hoisted: bool = False) -> Ciphertext:
    """BSGS matrix-vector product (ref: src/he-algo.c:47-93).

    hoisted=True uses double-hoisted rotations (one key switch per giant
    step instead of per baby step — CKKS.hoisted_gemv_fn)."""
    if hoisted:
        hplan = plan if isinstance(plan, HoistedGemvPlan) \
            else HoistedGemvPlan(eng, A)
        return gemv_hoisted(eng, hplan, ct, rk)
    if plan is None:
        plan = GemvPlan(eng, A)
    outer = None
    for i in range(plan.n2):
        shift = i * plan.n1
        inner = None
        for j in range(plan.n1):
            ct_rot = eng.rot(ct.copy(), j, rk)
            ct_rot = eng.mulpt(ct_rot, plan.pts[(i, j)])
            inner = ct_rot if inner is None else eng.add(inner, ct_rot)
        inner = eng.rot(inner, shift, rk)
        outer = inner if outer is None else eng.add(outer, inner)
    return eng.rs(outer)


class HoistedGemvPlan(GemvPlan):
    """GemvPlan with per-level pre-NTT'd diagonal packs for hoisted gemv."""

    def __init__(self, eng: CKKS, A: np.ndarray):
        super().__init__(eng, A)
        self._packs: dict[int, tuple] = {}
        self._rk_stacks: dict[int, tuple] = {}

    def pack(self, eng: CKKS, l: int):
        """(ptx, ptb, dims_h, dimc, nu_max) for level l (device arrays,
        built OUTSIDE jit)."""
        import jax.numpy as jnp
        if l not in self._packs:
            nu_max = max(pt.nu for pt in self.pts.values())
            dims_h = eng.dim_hoist(l, nu_max * self.n1)
            dimc = eng.ctx.dim_mulpt(l, nu_max * self.n1)
            def tab(dim):
                rows = []
                for i in range(self.n2):
                    rows.append(jnp.stack([
                        eng.ring.fwd_ntt(self.pts[(i, j)].m, dim,
                                         signed_bits=self.pts[(i, j)].mod_bits)
                        for j in range(self.n1)]))
                return jnp.stack(rows)
            self._packs[l] = (tab(dims_h), tab(dimc), dims_h, dimc, nu_max)
        return self._packs[l]

    def rk_stack(self, rk: dict[int, SwitchKey]):
        import jax.numpy as jnp
        key = id(rk)
        if key not in self._rk_stacks:
            self._rk_stacks[key] = (
                jnp.stack([rk[j].p0hat for j in range(self.n1)]),
                jnp.stack([rk[j].p1hat for j in range(self.n1)]))
        return self._rk_stacks[key]


def gemv_hoisted(eng: CKKS, plan: HoistedGemvPlan, ct: Ciphertext,
                 rk: dict[int, SwitchKey]) -> Ciphertext:
    """Double-hoisted BSGS gemv: one key switch per giant step."""
    l = ct.l
    nu_max = max(pt.nu for pt in plan.pts.values())
    if (eng.dim_hoist(l, nu_max * plan.n1) > eng.dimswk_h
            or eng.ring.ntt_impl == "matmul"):
        # plaintext scale exceeds the switch-key hoisting margin (or the
        # backend's NTT ordering has no permutation tables) — classic path
        return gemv(eng, None, ct, rk, plan=plan)
    ptx, ptb, dims_h, dimc, nu_max = plan.pack(eng, l)
    rk0, rk1 = plan.rk_stack(rk)
    f = eng.hoisted_gemv_fn(l, plan.n1, plan.n2, dims_h, dimc)
    out0, out1 = f(ct.c0, ct.c1, ptx, ptb, rk0, rk1)
    # ledger mirrors the classic composition: mulpt (nu*=, B*=) then adds
    nu_i = ct.nu * nu_max
    B_i = plan.n1 * ct.B * nu_max
    outer = None
    for i in range(plan.n2):
        inner = Ciphertext(l=l, nu=nu_i, B=B_i, c0=out0[i], c1=out1[i])
        if i:
            inner = eng.rot(inner, i * plan.n1, rk)
        outer = inner if outer is None else eng.add(outer, inner)
    return eng.rs(outer)


def he_sum(eng: CKKS, ct: Ciphertext, rk: dict[int, SwitchKey],
           hoisted: bool = False) -> Ciphertext:
    """Sum of slots into slot row 0 (ref: src/he-algo.c:95-103)."""
    slots = eng.ctx.slots
    A = np.zeros(slots * slots, dtype=np.complex128)
    A[:slots] = 1
    return gemv(eng, A, ct, rk, hoisted=hoisted)


def he_idx(eng: CKKS, ct: Ciphertext, idx: int, rk: dict[int, SwitchKey],
           hoisted: bool = False) -> Ciphertext:
    """Extract slot idx (ref: src/he-algo.c:105-112)."""
    slots = eng.ctx.slots
    A = np.zeros(slots * slots, dtype=np.complex128)
    A[idx * slots + idx] = 1
    return gemv(eng, A, ct, rk, hoisted=hoisted)


def he_nrm2(eng: CKKS, ct: Ciphertext, rlk: SwitchKey, ck: SwitchKey,
            rk: dict[int, SwitchKey]) -> Ciphertext:
    """Squared 2-norm: sum(ct * conj(ct)) (ref: src/he-algo.c:114-124)."""
    ct_conj = eng.conj(ct.copy(), ck)
    out = eng.rs(eng.mul(ct, ct_conj, rlk))
    return he_sum(eng, out, rk)
