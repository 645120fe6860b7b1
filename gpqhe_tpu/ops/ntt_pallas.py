"""Pallas TPU kernel: fused negacyclic NTT/INTT, all stages in VMEM.

The jnp butterfly path (ops/ntt.py) round-trips HBM through XLA's u64
emulation every stage.  This kernel keeps one prime's residue vector in VMEM
as u32 (lo, hi) planes for all logn stages, with Montgomery arithmetic
written directly in u32 16-bit partial products.

Mosaic-friendly data movement (no 1D reshapes — only leading-axis reshapes,
row slices and one transpose pair, all verified supported):

  view the vector as M[R, 128] (row-major, i = r*128 + c)
  - stages with len >= 128: butterflies pair ROWS (distance len/128);
    per-block zetas come from the first R entries of the standard bit-rev
    table, lane-replicated host-side.
  - stages with len < 128: operate on M^T [128, R]; pairs become row pairs
    again; per-stage zeta PLANES Z[g, r] = zetas[n/(2len) + r*128/(2len) + g]
    are precomputed host-side (127 rows total, padded to 128).

Twiddles/butterfly order match ops/ntt.py exactly (ref: src/ntt.c:37-73), so
this backend is interchangeable with 'butterfly' on the same NTT-resident
data.  Requires n >= 1024.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C = 128        # lane width
_M16 = 0xFFFF
_16 = 16

# When True, pallas_call runs in interpret mode (pure XLA emulation) — lets
# CPU tests exercise the exact kernel code paths without Mosaic.
INTERPRET = False


# ---------------------------------------------------------------------------
# u32-pair arithmetic
# ---------------------------------------------------------------------------

def _mulhilo32(a, b):
    al = a & _M16
    ah = a >> _16
    bl = b & _M16
    bh = b >> _16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    cross = (ll >> _16) + (lh & _M16) + (hl & _M16)
    hi = hh + (lh >> _16) + (hl >> _16) + (cross >> _16)
    lo = (cross << _16) | (ll & _M16)
    return hi, lo


def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < blo).astype(jnp.uint32)
    return lo, ahi + bhi + carry


def _sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    borrow = (alo < blo).astype(jnp.uint32)
    return lo, ahi - bhi - borrow


def _mul64_lo(alo, ahi, blo, bhi):
    h0, l0 = _mulhilo32(alo, blo)
    return l0, h0 + alo * bhi + ahi * blo


def _mul64_hi(alo, ahi, blo, bhi):
    h_ll, _ = _mulhilo32(alo, blo)
    h_lh, l_lh = _mulhilo32(alo, bhi)
    h_hl, l_hl = _mulhilo32(ahi, blo)
    h_hh, l_hh = _mulhilo32(ahi, bhi)
    c_lo = h_ll + l_lh
    c1 = (c_lo < l_lh).astype(jnp.uint32)
    c_lo2 = c_lo + l_hl
    c2 = (c_lo2 < l_hl).astype(jnp.uint32)
    carry32 = c1 + c2
    r_lo = l_hh + h_lh
    d1 = (r_lo < h_lh).astype(jnp.uint32)
    r_lo2 = r_lo + h_hl
    d2 = (r_lo2 < h_hl).astype(jnp.uint32)
    r_lo3 = r_lo2 + carry32
    d3 = (r_lo3 < carry32).astype(jnp.uint32)
    return r_lo3, h_hh + d1 + d2 + d3


def _mont_mul(alo, ahi, blo, bhi, plo, phi, vlo, vhi):
    """Montgomery a*b*R^-1 mod p, R=2^64 (ref: src/reduce.c:59-66)."""
    m_lo, m_hi = _mul64_lo(alo, ahi, blo, bhi)
    t_lo, t_hi = _mul64_hi(alo, ahi, blo, bhi)
    u_lo, u_hi = _mul64_lo(m_lo, m_hi, vlo, vhi)
    s_lo, s_hi = _mul64_hi(u_lo, u_hi, plo, phi)
    borrow = (t_hi < s_hi) | ((t_hi == s_hi) & (t_lo < s_lo))
    r_lo, r_hi = _sub64(t_lo, t_hi, s_lo, s_hi)
    a_lo, a_hi = _add64(r_lo, r_hi, plo, phi)
    return (jnp.where(borrow, a_lo, r_lo), jnp.where(borrow, a_hi, r_hi))


def _addmod(alo, ahi, blo, bhi, plo, phi):
    s_lo, s_hi = _add64(alo, ahi, blo, bhi)
    ge = (s_hi > phi) | ((s_hi == phi) & (s_lo >= plo))
    d_lo, d_hi = _sub64(s_lo, s_hi, plo, phi)
    return jnp.where(ge, d_lo, s_lo), jnp.where(ge, d_hi, s_hi)


def _submod(alo, ahi, blo, bhi, plo, phi):
    lt = (ahi < bhi) | ((ahi == bhi) & (alo < blo))
    d_lo, d_hi = _sub64(alo, ahi, blo, bhi)
    a_lo, a_hi = _add64(d_lo, d_hi, plo, phi)
    return jnp.where(lt, a_lo, d_lo), jnp.where(lt, a_hi, d_hi)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _big_stages(alo, ahi, zb_lo, zb_hi, plo, phi, vlo, vhi, R, P, inverse):
    """Stages with len >= 128 on the folded view M[R*P, C], row = r*P + j
    (j = poly index within the fold).  Butterfly partners sit P*len/128 rows
    apart and every row of a block shares one zeta, so the P>1 fold only
    changes the block height.  Forward: len descending from n/2 to 128;
    inverse: ascending 128..n/2 (GS)."""
    Ls = []
    L = R // 2
    while L >= 1:
        Ls.append(L)
        L //= 2
    if inverse:
        Ls = Ls[::-1]
    for L in Ls:
        nb = R // (2 * L)
        x0l = alo.reshape(nb, 2 * L * P, _C)[:, :L * P, :]
        x0h = ahi.reshape(nb, 2 * L * P, _C)[:, :L * P, :]
        x1l = alo.reshape(nb, 2 * L * P, _C)[:, L * P:, :]
        x1h = ahi.reshape(nb, 2 * L * P, _C)[:, L * P:, :]
        zl = zb_lo[nb:2 * nb, :].reshape(nb, 1, _C)
        zh = zb_hi[nb:2 * nb, :].reshape(nb, 1, _C)
        if not inverse:
            tl, th = _mont_mul(x1l, x1h, zl, zh, plo, phi, vlo, vhi)
            y0l, y0h = _addmod(x0l, x0h, tl, th, plo, phi)
            y1l, y1h = _submod(x0l, x0h, tl, th, plo, phi)
        else:
            y0l, y0h = _addmod(x0l, x0h, x1l, x1h, plo, phi)
            dl, dh = _submod(x0l, x0h, x1l, x1h, plo, phi)
            y1l, y1h = _mont_mul(dl, dh, zl, zh, plo, phi, vlo, vhi)
        alo = jnp.concatenate([y0l, y1l], axis=1).reshape(R * P, _C)
        ahi = jnp.concatenate([y0h, y1h], axis=1).reshape(R * P, _C)
    return alo, ahi


def _tail_stages(tlo, thi, zt_lo, zt_hi, plo, phi, vlo, vhi, W, inverse):
    """Stages with len < 128 on M^T [C, W] (W = R*P; the fold only widens the
    lane dimension — zt planes carry the P-fold repeat from _tail_planes).
    Forward: len descending 64..1; inverse: ascending 1..64.  zt rows are
    laid out in the same order."""
    lens = [64, 32, 16, 8, 4, 2, 1]
    if inverse:
        lens = lens[::-1]
    off = 0
    for ln in lens:
        gpr = _C // (2 * ln)
        x0l = tlo.reshape(gpr, 2 * ln, W)[:, :ln, :]
        x0h = thi.reshape(gpr, 2 * ln, W)[:, :ln, :]
        x1l = tlo.reshape(gpr, 2 * ln, W)[:, ln:, :]
        x1h = thi.reshape(gpr, 2 * ln, W)[:, ln:, :]
        zl = zt_lo[off:off + gpr, :].reshape(gpr, 1, W)
        zh = zt_hi[off:off + gpr, :].reshape(gpr, 1, W)
        if not inverse:
            tl, th = _mont_mul(x1l, x1h, zl, zh, plo, phi, vlo, vhi)
            y0l, y0h = _addmod(x0l, x0h, tl, th, plo, phi)
            y1l, y1h = _submod(x0l, x0h, tl, th, plo, phi)
        else:
            y0l, y0h = _addmod(x0l, x0h, x1l, x1h, plo, phi)
            dl, dh = _submod(x0l, x0h, x1l, x1h, plo, phi)
            y1l, y1h = _mont_mul(dl, dh, zl, zh, plo, phi, vlo, vhi)
        tlo = jnp.concatenate([y0l, y1l], axis=1).reshape(_C, W)
        thi = jnp.concatenate([y0h, y1h], axis=1).reshape(_C, W)
        off += gpr
    return tlo, thi


def _ntt_kernel(R: int, P: int, inverse: bool,
                a_ref, zbig_ref, ztail_ref, scc_ref, scr_ref, out_ref):
    """Grid-free single-prime kernel over a P-poly fold (the remote Mosaic
    helper rejects any gridded pallas_call — see CLAUDE.md).  a_ref is
    [2, R*P, C] with row = r*P + j for poly j of the fold; all P polys share
    the prime, so scalars and big-stage zetas are poly-independent.  Scalars
    arrive lane-replicated: scc [2, 8, C] rows = (p, pinv, ninv) for the
    normal domain, scr [2, 8, R*P] for the transposed domain."""
    plo_c = scc_ref[0, 0:1, :]
    phi_c = scc_ref[1, 0:1, :]
    vlo_c = scc_ref[0, 1:2, :]
    vhi_c = scc_ref[1, 1:2, :]
    nlo_c = scc_ref[0, 2:3, :]
    nhi_c = scc_ref[1, 2:3, :]
    plo_r = scr_ref[0, 0:1, :]
    phi_r = scr_ref[1, 0:1, :]
    vlo_r = scr_ref[0, 1:2, :]
    vhi_r = scr_ref[1, 1:2, :]
    alo = a_ref[0]
    ahi = a_ref[1]
    W = R * P
    if not inverse:
        alo, ahi = _big_stages(alo, ahi, zbig_ref[0], zbig_ref[1],
                               plo_c, phi_c, vlo_c, vhi_c, R, P, False)
        tlo, thi = alo.T, ahi.T
        tlo, thi = _tail_stages(tlo, thi, ztail_ref[0], ztail_ref[1],
                                plo_r, phi_r, vlo_r, vhi_r, W, False)
        alo, ahi = tlo.T, thi.T
    else:
        tlo, thi = a_ref[0].T, a_ref[1].T
        tlo, thi = _tail_stages(tlo, thi, ztail_ref[0], ztail_ref[1],
                                plo_r, phi_r, vlo_r, vhi_r, W, True)
        alo, ahi = tlo.T, thi.T
        alo, ahi = _big_stages(alo, ahi, zbig_ref[0], zbig_ref[1],
                               plo_c, phi_c, vlo_c, vhi_c, R, P, True)
        alo, ahi = _mont_mul(alo, ahi, nlo_c, nhi_c, plo_c, phi_c, vlo_c, vhi_c)
    out_ref[0] = alo
    out_ref[1] = ahi


# ---------------------------------------------------------------------------
# host-side plan + wrapper
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PallasNttPlan:
    dim: int
    n: int
    P: int                  # poly-fold factor (polys per kernel call)
    scc: jnp.ndarray        # u32[dim, 2, 8, C]: p/pinv/ninv lane-replicated
    scr: jnp.ndarray        # u32[dim, 2, 8, R*P]
    zbig_f: jnp.ndarray     # u32[dim, 2, R, C]
    ztail_f: jnp.ndarray    # u32[dim, 2, 128, R*P]
    zbig_i: jnp.ndarray
    ztail_i: jnp.ndarray


def _lane_rep_big(z: np.ndarray, R: int) -> np.ndarray:
    """First R entries of the zeta table, lane-replicated: [2, R, C] u32."""
    zr = z[:R]
    lo = (zr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (zr >> np.uint64(32)).astype(np.uint32)
    return np.stack([np.repeat(lo[:, None], _C, axis=1),
                     np.repeat(hi[:, None], _C, axis=1)])


def _tail_planes(z: np.ndarray, n: int, R: int, inverse: bool,
                 P: int = 1) -> np.ndarray:
    """[2, 128, R*P] u32: per-stage zeta planes Z[g, r*P+j] = z[nb + r*gpr + g]
    (repeated across the P-fold axis), stage rows concatenated in execution
    order."""
    lens = [64, 32, 16, 8, 4, 2, 1]
    if inverse:
        lens = lens[::-1]
    rows_lo, rows_hi = [], []
    r_idx = np.arange(R)
    for ln in lens:
        gpr = _C // (2 * ln)
        nb = n // (2 * ln)
        for g in range(gpr):
            vals = np.repeat(z[nb + r_idx * gpr + g], P)
            rows_lo.append((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
            rows_hi.append((vals >> np.uint64(32)).astype(np.uint32))
    rows_lo.append(np.zeros(R * P, dtype=np.uint32))
    rows_hi.append(np.zeros(R * P, dtype=np.uint32))
    return np.stack([np.stack(rows_lo), np.stack(rows_hi)])


def _scal_rows(p: int, pinv: int, ninv: int, width: int) -> np.ndarray:
    """[2, 8, width] lane-replicated scalar rows (p, pinv, ninv)."""
    out = np.zeros((2, 8, width), dtype=np.uint32)
    for row, val in enumerate((p, pinv, ninv)):
        out[0, row, :] = val & 0xFFFFFFFF
        out[1, row, :] = val >> 32
    return out


def make_pallas_plan(pctx, dim: int, P: int = 1) -> PallasNttPlan:
    n = pctx.n
    assert n >= 1024, "pallas NTT backend needs n >= 1024"
    R = n // _C
    scc, scr, zbf, ztf, zbi, zti = [], [], [], [], [], []
    for d in range(dim):
        pc = pctx.prime_ctx[d]
        scc.append(_scal_rows(pc.p, pc.pinv_mont, pc.ninv_mont, _C))
        scr.append(_scal_rows(pc.p, pc.pinv_mont, pc.ninv_mont, R * P))
        zbf.append(_lane_rep_big(pc.zetas, R))
        ztf.append(_tail_planes(pc.zetas, n, R, False, P))
        zbi.append(_lane_rep_big(pc.zetas_inv, R))
        zti.append(_tail_planes(pc.zetas_inv, n, R, True, P))
    return PallasNttPlan(
        dim=dim, n=n, P=P,
        scc=jnp.asarray(np.stack(scc)), scr=jnp.asarray(np.stack(scr)),
        zbig_f=jnp.asarray(np.stack(zbf)), ztail_f=jnp.asarray(np.stack(ztf)),
        zbig_i=jnp.asarray(np.stack(zbi)), ztail_i=jnp.asarray(np.stack(zti)),
    )


def _split(a, R):
    lo = (a & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (a >> jnp.uint64(32)).astype(jnp.uint32)
    return jnp.stack([lo, hi], axis=-2).reshape(a.shape[:-1] + (2, R, _C))


def _join(x, n):
    flat = x.reshape(x.shape[:-3] + (2, n))
    return flat[..., 0, :].astype(jnp.uint64) | \
        (flat[..., 1, :].astype(jnp.uint64) << jnp.uint64(32))


def ntt_pallas(a, plan: PallasNttPlan, inverse: bool = False,
               interpret: bool | None = None):
    """u64[dim, n] (plan.P == 1) or u64[P, dim, n] -> same shape.  One
    grid-free pallas call per prime covering all P polys of the fold
    (identical kernels — XLA dedups the compilations); compose under jit."""
    if interpret is None:
        interpret = INTERPRET
    P = plan.P
    if P == 1:
        dim, n = a.shape
        R = n // _C
        a32 = _split(a, R)                              # [dim, 2, R, C]
    else:
        Pa, dim, n = a.shape
        assert Pa == P, (Pa, P)
        R = n // _C
        a32 = _split(a, R)                              # [P, dim, 2, R, C]
        a32 = a32.transpose(1, 2, 3, 0, 4).reshape(dim, 2, R * P, _C)
    zbig = plan.zbig_i if inverse else plan.zbig_f
    ztail = plan.ztail_i if inverse else plan.ztail_f
    kernel = functools.partial(_ntt_kernel, R, P, inverse)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, R * P, _C), jnp.uint32),
        interpret=interpret,
    )

    # one call site via lax.map -> a single Mosaic compilation for all primes
    def body(args):
        return call(*args)
    out = jax.lax.map(body, (a32, zbig, ztail, plan.scc, plan.scr))
    if P == 1:
        return _join(out, n)
    out = out.reshape(dim, 2, R, P, _C).transpose(3, 0, 1, 2, 4)
    return _join(out, n)
