"""RNS decompose / CRT reconstruct between limb tensors and residue stacks.

Device equivalents of the reference's rns.c (ref: src/rns.c:37-75) and the
CRT-lift half of poly_rns2mpi (ref: src/poly.c:109-120):

  decompose:    u32-limb poly [n, K]  ->  residues u64[dim, n]  (a mod p_d)
  reconstruct:  residues u64[dim, n]  ->  centered limbs [n, KS]
                (CRT lift, then smod P — the exact integer the product equals)

The reconstruct avoids per-coefficient big-int division: y_d = a_d*phat_d^-1
mod p_d, S = sum_d y_d*phat_d (exact, 16-bit digit accumulation), and the
CRT overflow multiple alpha = floor(S/P) < dim is estimated in f64 and
corrected exactly with limb compares (standard RNS lift; the reference instead
does dim big-int mulm/addm per coefficient, ref: src/rns.c:60-75).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..substrate import bigint
from .modmath import mont_mul
from . import limbs as lb


@dataclass(frozen=True)
class BasisArrays:
    """Device copies of per-basis constants (uploaded once per context)."""
    dim: int
    ps: jnp.ndarray            # u64[dim]
    pinv: jnp.ndarray          # u64[dim]
    ninv_mont: jnp.ndarray     # u64[dim]
    r2: jnp.ndarray            # u64[dim]
    phatinv_mont: jnp.ndarray  # u64[dim]
    ninvphat_mont: jnp.ndarray  # u64[dim] n^-1 phat^-1 (scaled-INTT constant)
    zetas: jnp.ndarray         # u64[dim, n]
    zetas_inv: jnp.ndarray     # u64[dim, n]


@dataclass(frozen=True)
class ReconPlan:
    """Constants for CRT reconstruction over one basis."""
    dim: int
    ds: int                 # digit width of the accumulator (16-bit digits)
    ks: int                 # output limb count = ds // 2
    phat16: np.ndarray      # u64[dim, ds] digits of phat_d
    negP16: np.ndarray      # u64[ds] digits of 2^(16 ds) - P
    P_limbs: np.ndarray     # u32[ks]
    Phalf_limbs: np.ndarray  # u32[ks] floor(P/2)
    MminusP_limbs: np.ndarray  # u32[ks] 2^(32 ks) - P
    inv_p: np.ndarray       # f64[dim]
    phat32: np.ndarray      # u64[dim] phat_d mod 2^32 (alpha residue check)
    P32: int                # P mod 2^32
    logP: int               # P.bit_length() (fast-path margin validation)


def make_basis_arrays(poly_ctx, dim: int) -> BasisArrays:
    b = poly_ctx.basis(dim)
    return BasisArrays(
        dim=dim,
        ps=jnp.array(b.ps),
        pinv=jnp.array(b.pinv_mont),
        ninv_mont=jnp.array(b.ninv_mont),
        r2=jnp.array(b.r2),
        phatinv_mont=jnp.array(b.phatinv_mont),
        ninvphat_mont=jnp.array(b.ninvphat_mont),
        zetas=jnp.array(poly_ctx.zetas(dim)),
        zetas_inv=jnp.array(poly_ctx.zetas_inv(dim)),
    )


def make_recon_plan(poly_ctx, dim: int) -> ReconPlan:
    b = poly_ctx.basis(dim)
    ds = (b.P.bit_length() + 15) // 16 + 2
    if ds % 2:
        ds += 1
    ks = ds // 2
    M = 1 << (16 * ds)
    phat16 = np.stack([bigint.digits16(ph, ds) for ph in b.phat]).astype(np.uint64)
    negP16 = bigint.digits16(M - b.P, ds).astype(np.uint64)
    return ReconPlan(
        dim=dim, ds=ds, ks=ks,
        phat16=phat16,
        negP16=negP16,
        P_limbs=bigint.int_to_limbs(b.P, ks),
        Phalf_limbs=bigint.int_to_limbs(b.P_half, ks),
        MminusP_limbs=bigint.int_to_limbs((1 << (32 * ks)) - b.P, ks),
        inv_p=np.array([1.0 / p for p in b.primes], dtype=np.float64),
        phat32=np.array([ph & 0xFFFFFFFF for ph in b.phat], dtype=np.uint64),
        P32=b.P & 0xFFFFFFFF,
        logP=b.P.bit_length(),
    )


def make_decomp_weights(poly_ctx, dim: int, k_limbs: int) -> np.ndarray:
    """u64[dim, J]: V_j = 2^(64(j+1)) mod p_d, J = ceil(K/2) (so that
    mont_mul(c_j, V_j) == c_j * 2^(64 j) mod p for u64 digits c_j)."""
    j_digits = (k_limbs + 1) // 2
    out = np.empty((dim, j_digits), dtype=np.uint64)
    for d, p in enumerate(poly_ctx.primes[:dim]):
        for j in range(j_digits):
            out[d, j] = pow(2, 64 * (j + 1), p)
    return out


def decompose_core(a, ps, pinv, weights) -> jnp.ndarray:
    """All-arrays decompose (shardable: pass per-shard ps/pinv/weights)."""
    k = a.shape[-1]
    j_digits = (k + 1) // 2
    if k % 2:
        a = lb.resize(a, k + 1)
    au = a.astype(jnp.uint64)
    # u64 digits c_j = limb[2j] | limb[2j+1] << 32 -> [..., n, J]
    c = au[..., 0::2] | (au[..., 1::2] << jnp.uint64(32))
    w = jnp.asarray(weights)  # [dim, J]
    # accumulate over digits, keeping partial sums < p
    acc = None
    for j in range(j_digits):
        cj = c[..., None, :, j]                     # [..., 1, n]
        term = mont_mul(cj, w[:, j][:, None], ps[:, None], pinv[:, None])
        if acc is None:
            acc = term
        else:
            s = acc + term
            acc = jnp.where(s >= ps[:, None], s - ps[:, None], s)
    return acc


def decompose(a, ba: BasisArrays, weights) -> jnp.ndarray:
    """u32[..., n, K] -> u64[..., dim, n]: a mod p_d per prime
    (ref: src/rns.c:37-48; input is a nonnegative representative)."""
    return decompose_core(a, ba.ps, ba.pinv, weights)


def phat_shift_table(plan: ReconPlan) -> np.ndarray:
    """f64[4, dim, ds]: phat_shift[t][d, s] = phat16[d, s - t]."""
    ds = plan.ds
    out = np.zeros((4, plan.dim, ds), dtype=np.float64)
    for t in range(4):
        out[t, :, t:] = plan.phat16[:, :ds - t].astype(np.float64)
    return out


def reconstruct_core(res, ps, pinv, phatinv_mont, phat_shift, inv_p, negP16,
                     MminusP_limbs, P_limbs, Phalf_limbs, ks: int, dim_total: int,
                     center: bool = True, axis_name: str | None = None,
                     k_out: int | None = None, phat32=None, P32: int | None = None,
                     pre_scaled: bool = False):
    """All-arrays CRT reconstruction (shardable over the prime axis).

    When axis_name is given, `res`/constants hold only this shard's primes and
    the digit sums + alpha estimate are combined with a psum over that mesh
    axis (the CRT partial-sum collective, SURVEY.md §2).

    When k_out is given (with phat32/P32), the TRUNCATED fast path runs: only
    the low 2*k_out digit columns of S are accumulated (the value is needed
    mod 2^(32 k_out) only — callers immediately mask to q_l), and the
    alpha off-by-one is fixed by an EXACT mod-2^32 residue check instead of
    full-width limb compares: limb 0 of the carried result must equal
    (S - alpha*P) mod 2^32; on mismatch the correction direction follows the
    f64 fraction (|af - S/P| < 2^-39 << 1/2, so the side is certain).  For
    center=True the smod-P/2 decision ALSO comes from the f64 fraction,
    which is only valid when |value| <= P/8 — the caller must validate the
    magnitude margin (reconstruct() checks logP - bound_bits >= 3).
    """
    psb = ps[:, None]
    pinvb = pinv[:, None]
    fast = k_out is not None
    if pre_scaled:
        # the INTT already multiplied by phatinv (scaled-INTT fusion)
        y = res
    else:
        y = mont_mul(res, phatinv_mont[:, None], psb, pinvb)  # [..., dim, n]
    # S = sum_d y_d * phat_d in 16-bit digit planes, accumulated as ONE EXACT
    # f64 matmul with contraction over (4 shifts x dim): every product
    # <= (2^16-1)^2 < 2^32 and every digit sum <= 4*dim*2^32 < 2^41 << 2^53,
    # so f64 arithmetic here is integer-exact (verified exact on TPU's
    # emulated f64 in this range; addition order is immaterial since all
    # partial sums are exact integers).
    dim_here = res.shape[-2]
    n_here = res.shape[-1]
    kd = min(2 * k_out, phat_shift.shape[-1]) if fast else phat_shift.shape[-1]
    yts = jnp.stack(
        [((y >> jnp.uint64(16 * t)) & jnp.uint64(0xFFFF)).astype(jnp.float64)
         for t in range(4)], axis=-3)                     # [..., 4, dim, n]
    Y = yts.reshape(y.shape[:-2] + (4 * dim_here, n_here))
    W = phat_shift[..., :kd].reshape(4 * dim_here, kd)
    s_digits = jnp.einsum("...kn,ks->...ns", Y, W)
    # alpha = floor(S / P) estimated in f64, corrected exactly below
    af = jnp.einsum("...dn,d->...n", y.astype(jnp.float64), inv_p)
    if fast:
        # S mod 2^32 for the exact off-by-one detector (wrapping u64 is fine)
        s32 = jnp.sum(y * phat32[:, None], axis=-2)       # [..., n] u64
    if axis_name is not None:
        import jax
        s_digits = jax.lax.psum(s_digits, axis_name)
        af = jax.lax.psum(af, axis_name)
        if fast:
            s32 = jax.lax.psum(s32, axis_name)
    alpha = jnp.clip(jnp.floor(af), 0.0, float(dim_total))
    # S - alpha*P == S + alpha*(M - P) mod M  (still exact in f64: < 2^42)
    s_digits = s_digits + alpha[..., None] * negP16[:kd]
    if not fast:
        r = lb.from_digits16(s_digits.astype(jnp.uint64), ks)  # u32[..., n, ks]
        # correct alpha off-by-one: E in (-P, 2P)
        r = lb.select(lb.geq_const(r, MminusP_limbs),
                      lb.add(r, jnp.broadcast_to(P_limbs, r.shape)), r)
        r = lb.select(lb.geq_const(r, P_limbs),
                      lb.sub(r, jnp.broadcast_to(P_limbs, r.shape)), r)
        if center:
            # smod P (ref: src/types.c:108-113 with q=P)
            r = lb.select(lb.geq_const(r, Phalf_limbs),
                          lb.sub(r, jnp.broadcast_to(P_limbs, r.shape)), r)
        return r
    r = lb.from_digits16(s_digits.astype(jnp.uint64), k_out)
    # off-by-one: limb 0 must equal (S - alpha*P) mod 2^32
    a64 = alpha.astype(jnp.uint64)
    expected = (s32 - a64 * jnp.uint64(P32)) & jnp.uint64(0xFFFFFFFF)
    mismatch = r[..., 0].astype(jnp.uint64) != expected
    up = (af - alpha) > 0.5          # true alpha = alpha_est + 1
    Plow = jnp.broadcast_to(P_limbs[:k_out], r.shape)
    r = lb.select(mismatch & up, lb.sub(r, Plow), r)
    r = lb.select(mismatch & ~up, lb.add(r, Plow), r)
    if center:
        corr = jnp.where(mismatch, jnp.where(up, 1.0, -1.0), 0.0)
        frac = af - alpha - corr     # = (value mod P)/P up to 2^-39
        r = lb.select(frac > 0.5, lb.sub(r, Plow), r)
    return r


def reconstruct(res, ba: BasisArrays, plan: ReconPlan, center: bool = True,
                k_out: int | None = None,
                bound_bits: int | None = None,
                pre_scaled: bool = False) -> jnp.ndarray:
    """u64[..., dim, n] -> u32[..., n, ks] limbs mod 2^(32 ks).

    center=True: the exact centered integer (CRT lift then smod P,
    ref: src/poly.c:109-120 first smod), two's complement.
    center=False: the nonnegative residue in [0, P) (used by the key-switch
    divide-by-P path, which needs r = c mod P exactly).

    k_out (optional): compute the value mod 2^(32 k_out) only (truncated
    digit accumulation + residue-checked alpha instead of full-width
    compares).  For center=True the caller must pass bound_bits — a proven
    bound |value| < 2^bound_bits — and the fast path engages only when the
    basis leaves >= 3 bits of margin (it always does for the dim_* formulas
    in context.py, which overshoot by most of one 59-bit prime)."""
    fast_ok = (k_out is not None and k_out <= plan.ks
               and (not center
                    or (bound_bits is not None
                        and plan.logP - bound_bits >= 3)))
    return reconstruct_core(
        res, ba.ps, ba.pinv, ba.phatinv_mont,
        jnp.asarray(phat_shift_table(plan)),
        jnp.asarray(plan.inv_p),
        jnp.asarray(plan.negP16.astype(np.float64)),
        jnp.asarray(plan.MminusP_limbs), jnp.asarray(plan.P_limbs),
        jnp.asarray(plan.Phalf_limbs),
        ks=plan.ks, dim_total=plan.dim, center=center,
        k_out=k_out if fast_ok else None,
        phat32=jnp.asarray(plan.phat32) if fast_ok else None,
        P32=plan.P32 if fast_ok else None,
        pre_scaled=pre_scaled)
