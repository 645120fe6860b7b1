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
         plan: GemvPlan | None = None) -> Ciphertext:
    """BSGS matrix-vector product (ref: src/he-algo.c:47-93)."""
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


def he_sum(eng: CKKS, ct: Ciphertext, rk: dict[int, SwitchKey]) -> Ciphertext:
    """Sum of slots into slot row 0 (ref: src/he-algo.c:95-103)."""
    slots = eng.ctx.slots
    A = np.zeros(slots * slots, dtype=np.complex128)
    A[:slots] = 1
    return gemv(eng, A, ct, rk)


def he_idx(eng: CKKS, ct: Ciphertext, idx: int, rk: dict[int, SwitchKey]) -> Ciphertext:
    """Extract slot idx (ref: src/he-algo.c:105-112)."""
    slots = eng.ctx.slots
    A = np.zeros(slots * slots, dtype=np.complex128)
    A[idx * slots + idx] = 1
    return gemv(eng, A, ct, rk)


def he_nrm2(eng: CKKS, ct: Ciphertext, rlk: SwitchKey, ck: SwitchKey,
            rk: dict[int, SwitchKey]) -> Ciphertext:
    """Squared 2-norm: sum(ct * conj(ct)) (ref: src/he-algo.c:114-124)."""
    ct_conj = eng.conj(ct.copy(), ck)
    out = eng.rs(eng.mul(ct, ct_conj, rlk))
    return he_sum(eng, out, rk)
