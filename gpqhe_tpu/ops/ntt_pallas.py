"""Pallas TPU kernel: fused negacyclic NTT/INTT, all stages in VMEM.

The jnp butterfly path (ops/ntt.py) round-trips HBM through XLA's u64
emulation every stage.  This kernel keeps one prime's residue vectors in VMEM
as u32 (lo, hi) planes for all logn stages.

Arithmetic: Shoup multiplication with Harvey-style lazy reduction instead of
Montgomery.  Twiddles are stored in the STANDARD domain together with their
Shoup companions z' = floor(z * 2^64 / p); one butterfly multiply costs
~24 16-bit partial products (vs ~40 for the 64-bit Montgomery chain):

    q = mulhi64_approx(x, z')       # drops the ll partial: q in {q*, q*-1}
    r = lo64(x*z) - lo64(q*p)       # r = x*z mod p + k*p, k in {0,1,2}
    r -= 2p if r >= 2p              # r < 2p

Coefficients ride a lazy < 4p invariant through the forward stages (inputs
< p; one conditional 2p-subtract on x0 per butterfly) and < 4p/< 2p through
the inverse; outputs are reduced exactly to [0, p) at the end, so results
are BIT-IDENTICAL to the 'butterfly' backend (ref: src/ntt.c:37-73 order).

Mosaic-friendly data movement (no 1D reshapes — only leading-axis reshapes,
row slices and one transpose pair per poly):

  each poly's vector is a slab M[R, 128] (row-major, i = r*128 + c);
  a P-poly fold is poly-MAJOR ([2, P*R, C], row = j*R + r), so zeta tables
  are shared across the fold with NO per-fold replication:
  - stages with len >= 128: butterflies pair ROWS (distance len/128);
    per-block zetas come from the first R entries of the standard bit-rev
    table, lane-replicated host-side.
  - stages with len < 128: operate on M^T [128, R]; pairs become row pairs
    again; per-stage zeta PLANES Z[g, r] = zetas[n/(2len) + r*128/(2len) + g]
    are precomputed host-side (127 rows total, padded to 128).

Requires n >= 1024.
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


def _mul64_hi_approx(alo, ahi, blo, bhi):
    """High 64 bits of the 128-bit product, MINUS at most 1: the ll partial
    product is dropped entirely, losing at most one carry into the high
    half (h0 < 2^32 dropped from the 34-bit cross sum)."""
    h1, l1 = _mulhilo32(alo, bhi)
    h2, l2 = _mulhilo32(ahi, blo)
    h3, l3 = _mulhilo32(ahi, bhi)
    m = l1 + l2
    c1 = (m < l2).astype(jnp.uint32)      # carry of the (approx) cross sum
    lo = l3 + h1
    d1 = (lo < h1).astype(jnp.uint32)
    lo2 = lo + h2
    d2 = (lo2 < h2).astype(jnp.uint32)
    lo3 = lo2 + c1
    d3 = (lo3 < c1).astype(jnp.uint32)
    return lo3, h3 + d1 + d2 + d3


def _geq64(alo, ahi, blo, bhi):
    return (ahi > bhi) | ((ahi == bhi) & (alo >= blo))


def _cond_sub(alo, ahi, blo, bhi):
    """a - b if a >= b else a."""
    ge = _geq64(alo, ahi, blo, bhi)
    dlo, dhi = _sub64(alo, ahi, blo, bhi)
    return jnp.where(ge, dlo, alo), jnp.where(ge, dhi, ahi)


def _shoup_mul(xlo, xhi, zlo, zhi, zslo, zshi, plo, phi, p2lo, p2hi):
    """x * z mod p, lazily: result < 2p.  Any x < 2^64; z < p < 2^60.
    q = approx-hi(x*z') with error <= 1, so r = lo(x*z) - lo(q*p) < 3p."""
    qlo, qhi = _mul64_hi_approx(xlo, xhi, zslo, zshi)
    r1lo, r1hi = _mul64_lo(xlo, xhi, zlo, zhi)
    r2lo, r2hi = _mul64_lo(qlo, qhi, plo, phi)
    rlo, rhi = _sub64(r1lo, r1hi, r2lo, r2hi)
    return _cond_sub(rlo, rhi, p2lo, p2hi)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_butterfly(x0l, x0h, x1l, x1h, zl, zh, zsl, zsh, sc):
    """Lazy CT butterfly: inputs < 4p, outputs < 4p."""
    plo, phi, p2lo, p2hi, p4lo, p4hi = sc
    x0l, x0h = _cond_sub(x0l, x0h, p2lo, p2hi)           # < 2p
    tl, th = _shoup_mul(x1l, x1h, zl, zh, zsl, zsh, plo, phi, p2lo, p2hi)
    y0l, y0h = _add64(x0l, x0h, tl, th)                  # < 4p
    d0l, d0h = _add64(x0l, x0h, p2lo, p2hi)
    y1l, y1h = _sub64(d0l, d0h, tl, th)                  # in (0, 4p)
    return y0l, y0h, y1l, y1h


def _inv_butterfly(x0l, x0h, x1l, x1h, zl, zh, zsl, zsh, sc):
    """Lazy GS butterfly: inputs < 4p, outputs < 4p (y1 even < 2p)."""
    plo, phi, p2lo, p2hi, p4lo, p4hi = sc
    sl, sh = _add64(x0l, x0h, x1l, x1h)                  # < 8p
    y0l, y0h = _cond_sub(sl, sh, p4lo, p4hi)             # < 4p
    dl, dh = _add64(x0l, x0h, p4lo, p4hi)
    dl, dh = _sub64(dl, dh, x1l, x1h)                    # in (0, 8p) < 2^63
    y1l, y1h = _shoup_mul(dl, dh, zl, zh, zsl, zsh, plo, phi, p2lo, p2hi)
    return y0l, y0h, y1l, y1h


def _big_stages(alo, ahi, zb, zbs, sc, R, inverse):
    """Stages with len >= 128 on one poly slab M[R, C]; every row of a block
    shares one zeta.  Forward: len descending from n/2 to 128; inverse:
    ascending 128..n/2 (GS).

    FORWARD stage PAIRS are fused into one pass (radix-4-style data
    routing): the intermediate slab between the two stages never
    materializes, halving the per-stage reshape/concat rewrites the NTT
    roofline identified as the dominant overhead (README §roofline).  The
    per-butterfly op order is unchanged, so results stay bit-identical to
    the unfused path (and to the 'butterfly' backend).  INVERSE stages stay
    unfused: the fused GS pass is a Mosaic compile pathology on v5e — a
    (P=8, F=2) inverse kernel sat >29 min in the remote compile helper (and
    (P=8, F=4) got OOM-SIGKILLed) while the same-shape fused FORWARD kernel
    compiled in ~8 min and unfused inverse kernels compile in minutes."""
    Ls = []
    L = R // 2
    while L >= 1:
        Ls.append(L)
        L //= 2
    if inverse:
        Ls = Ls[::-1]
    bf = _inv_butterfly if inverse else _fwd_butterfly

    def zslice(start, cnt, group):
        """(lo, hi, shoup-lo, shoup-hi) zeta rows [start, start+cnt) shaped
        (cnt//group, group, 1->C broadcastable)."""
        zl = zb[0, start:start + cnt, :].reshape(cnt // group, group, _C)
        zh = zb[1, start:start + cnt, :].reshape(cnt // group, group, _C)
        zsl = zbs[0, start:start + cnt, :].reshape(cnt // group, group, _C)
        zsh = zbs[1, start:start + cnt, :].reshape(cnt // group, group, _C)
        return zl, zh, zsl, zsh

    i = 0
    while i < len(Ls):
        fuse = i + 1 < len(Ls) and not inverse
        if fuse:
            L = Ls[i]                       # distance L, then L//2
            h = L // 2
            nb = R // (2 * L)
            xl = alo.reshape(nb, 4, h, _C)
            xh = ahi.reshape(nb, 4, h, _C)
            zAl, zAh, zAsl, zAsh = zslice(nb, nb, 1)
            zBl, zBh, zBsl, zBsh = zslice(2 * nb, 2 * nb, 2)
            a0l, a0h, a2l, a2h = bf(xl[:, 0], xh[:, 0], xl[:, 2], xh[:, 2],
                                    zAl, zAh, zAsl, zAsh, sc)
            a1l, a1h, a3l, a3h = bf(xl[:, 1], xh[:, 1], xl[:, 3], xh[:, 3],
                                    zAl, zAh, zAsl, zAsh, sc)
            b0l, b0h, b1l, b1h = bf(a0l, a0h, a1l, a1h,
                                    zBl[:, 0:1], zBh[:, 0:1],
                                    zBsl[:, 0:1], zBsh[:, 0:1], sc)
            b2l, b2h, b3l, b3h = bf(a2l, a2h, a3l, a3h,
                                    zBl[:, 1:2], zBh[:, 1:2],
                                    zBsl[:, 1:2], zBsh[:, 1:2], sc)
            alo = jnp.concatenate([b0l, b1l, b2l, b3l], axis=1).reshape(R, _C)
            ahi = jnp.concatenate([b0h, b1h, b2h, b3h], axis=1).reshape(R, _C)
            i += 2
        else:
            L = Ls[i]
            nb = R // (2 * L)
            x0l = alo.reshape(nb, 2 * L, _C)[:, :L, :]
            x0h = ahi.reshape(nb, 2 * L, _C)[:, :L, :]
            x1l = alo.reshape(nb, 2 * L, _C)[:, L:, :]
            x1h = ahi.reshape(nb, 2 * L, _C)[:, L:, :]
            zl, zh, zsl, zsh = zslice(nb, nb, 1)
            y0l, y0h, y1l, y1h = bf(x0l, x0h, x1l, x1h, zl, zh, zsl, zsh, sc)
            alo = jnp.concatenate([y0l, y1l], axis=1).reshape(R, _C)
            ahi = jnp.concatenate([y0h, y1h], axis=1).reshape(R, _C)
            i += 1
    return alo, ahi


def _tail_stages(tlo, thi, zt, zts, sc, W, inverse):
    """Stages with len < 128 on M^T [C, W] (W = R).  Forward: len descending
    64..1; inverse: ascending 1..64.  zt rows are laid out in the same
    order.  Stage pairs are fused exactly like _big_stages (the zeta PLANES
    are per-stage rows consumed at two offsets per pass)."""
    lens = [64, 32, 16, 8, 4, 2, 1]
    if inverse:
        lens = lens[::-1]
    bf = _inv_butterfly if inverse else _fwd_butterfly

    def zplane(off, cnt, group, zarr):
        return zarr[0, off:off + cnt, :].reshape(cnt // group, group, W), \
            zarr[1, off:off + cnt, :].reshape(cnt // group, group, W)

    offs = []
    off = 0
    for ln in lens:
        offs.append(off)
        off += _C // (2 * ln)

    i = 0
    while i < len(lens):
        fuse = i + 1 < len(lens) and not inverse
        if fuse:
            ln = lens[i]                     # distance ln, then ln//2
            h = ln // 2
            g = _C // (2 * ln)
            xl = tlo.reshape(g, 4, h, W)
            xh = thi.reshape(g, 4, h, W)
            zAl, zAh = zplane(offs[i], g, 1, zt)
            zAsl, zAsh = zplane(offs[i], g, 1, zts)
            zBl, zBh = zplane(offs[i + 1], 2 * g, 2, zt)
            zBsl, zBsh = zplane(offs[i + 1], 2 * g, 2, zts)
            a0l, a0h, a2l, a2h = bf(xl[:, 0], xh[:, 0], xl[:, 2], xh[:, 2],
                                    zAl, zAh, zAsl, zAsh, sc)
            a1l, a1h, a3l, a3h = bf(xl[:, 1], xh[:, 1], xl[:, 3], xh[:, 3],
                                    zAl, zAh, zAsl, zAsh, sc)
            b0l, b0h, b1l, b1h = bf(a0l, a0h, a1l, a1h,
                                    zBl[:, 0:1], zBh[:, 0:1],
                                    zBsl[:, 0:1], zBsh[:, 0:1], sc)
            b2l, b2h, b3l, b3h = bf(a2l, a2h, a3l, a3h,
                                    zBl[:, 1:2], zBh[:, 1:2],
                                    zBsl[:, 1:2], zBsh[:, 1:2], sc)
            tlo = jnp.concatenate([b0l, b1l, b2l, b3l], axis=1).reshape(_C, W)
            thi = jnp.concatenate([b0h, b1h, b2h, b3h], axis=1).reshape(_C, W)
            i += 2
        else:
            ln = lens[i]
            gpr = _C // (2 * ln)
            x0l = tlo.reshape(gpr, 2 * ln, W)[:, :ln, :]
            x0h = thi.reshape(gpr, 2 * ln, W)[:, :ln, :]
            x1l = tlo.reshape(gpr, 2 * ln, W)[:, ln:, :]
            x1h = thi.reshape(gpr, 2 * ln, W)[:, ln:, :]
            zl, zh = zplane(offs[i], gpr, 1, zt)
            zsl, zsh = zplane(offs[i], gpr, 1, zts)
            y0l, y0h, y1l, y1h = bf(x0l, x0h, x1l, x1h, zl, zh, zsl, zsh, sc)
            tlo = jnp.concatenate([y0l, y1l], axis=1).reshape(_C, W)
            thi = jnp.concatenate([y0h, y1h], axis=1).reshape(_C, W)
            i += 1
    return tlo, thi


def _scalars(sc_ref):
    """(p, 2p, 4p) lo/hi rows from a [2, 8, width] scalar block."""
    plo = sc_ref[0, 0:1, :]
    phi = sc_ref[1, 0:1, :]
    p2lo = sc_ref[0, 1:2, :]
    p2hi = sc_ref[1, 1:2, :]
    p4lo = sc_ref[0, 2:3, :]
    p4hi = sc_ref[1, 2:3, :]
    return plo, phi, p2lo, p2hi, p4lo, p4hi


def _ntt_kernel(R: int, P: int, F: int, inverse: bool, scaled: bool,
                a_ref, zb_ref, zbs_ref, zt_ref, zts_ref, scc_ref, scr_ref,
                out_ref):
    """Grid-free kernel over an (F-prime x P-poly) fold (the remote Mosaic
    helper rejects any gridded pallas_call — see CLAUDE.md).  a_ref is
    [2, F*P*R, C], prime-major poly-major (row = (f*P + j)*R + r): each
    (prime, poly) slab runs through the stage pipeline independently; the
    P polys of one prime share its zeta tables.  Per-prime tables stack
    along the row axis: zb [2, F*R, C], zt [2, F*128, R]; scalars arrive
    lane-replicated per prime: scc [2, F*8, C] rows (f*8 + row) =
    (p, 2p, 4p, ninv, ninv', ninvphat, ninvphat') for the normal domain,
    scr [2, F*8, R] for the transposed domain.  scaled=True makes the
    INTT's final scaling multiply by n^-1 * phat^-1 (CRT-reconstruct
    fusion)."""
    for f in range(F):
        zb = zb_ref[:, f * R:(f + 1) * R, :]
        zbs = zbs_ref[:, f * R:(f + 1) * R, :]
        zt = zt_ref[:, f * _C:(f + 1) * _C, :]
        zts = zts_ref[:, f * _C:(f + 1) * _C, :]
        scc = scc_ref[:, f * 8:(f + 1) * 8, :]
        scr = scr_ref[:, f * 8:(f + 1) * 8, :]
        sc_c = _scalars(scc)
        sc_r = _scalars(scr)
        srow = 5 if scaled else 3
        nlo = scc[0, srow:srow + 1, :]
        nhi = scc[1, srow:srow + 1, :]
        nslo = scc[0, srow + 1:srow + 2, :]
        nshi = scc[1, srow + 1:srow + 2, :]
        plo_r, phi_r, p2lo_r, p2hi_r = sc_r[0], sc_r[1], sc_r[2], sc_r[3]
        plo_c, phi_c, p2lo_c, p2hi_c = sc_c[0], sc_c[1], sc_c[2], sc_c[3]
        for j in range(P):
            row = (f * P + j) * R
            alo = a_ref[0, row:row + R, :]
            ahi = a_ref[1, row:row + R, :]
            if not inverse:
                alo, ahi = _big_stages(alo, ahi, zb, zbs, sc_c, R, False)
                tlo, thi = alo.T, ahi.T
                tlo, thi = _tail_stages(tlo, thi, zt, zts, sc_r, R, False)
                # exact reduction to [0, p)
                tlo, thi = _cond_sub(tlo, thi, p2lo_r, p2hi_r)
                tlo, thi = _cond_sub(tlo, thi, plo_r, phi_r)
                alo, ahi = tlo.T, thi.T
            else:
                tlo, thi = alo.T, ahi.T
                tlo, thi = _tail_stages(tlo, thi, zt, zts, sc_r, R, True)
                alo, ahi = tlo.T, thi.T
                alo, ahi = _big_stages(alo, ahi, zb, zbs, sc_c, R, True)
                alo, ahi = _shoup_mul(alo, ahi, nlo, nhi, nslo, nshi,
                                      plo_c, phi_c, p2lo_c, p2hi_c)
                alo, ahi = _cond_sub(alo, ahi, plo_c, phi_c)
            out_ref[0, row:row + R, :] = alo
            out_ref[1, row:row + R, :] = ahi


# ---------------------------------------------------------------------------
# host-side plan + wrapper
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PallasNttPlan:
    dim: int
    n: int
    P: int                  # poly-fold factor (polys per kernel call)
    F: int                  # prime-fold factor (primes per kernel call)
    dimp: int               # dim padded up to a multiple of F
    scc: jnp.ndarray        # u32[G, 2, F*8, C]: p/2p/4p/ninv/ninv' lane-rep
    scr: jnp.ndarray        # u32[G, 2, F*8, R]
    zbig_f: jnp.ndarray     # u32[G, 2, F*R, C] standard-domain zetas
    zbigs_f: jnp.ndarray    # u32[G, 2, F*R, C] Shoup companions
    ztail_f: jnp.ndarray    # u32[G, 2, F*128, R]
    ztails_f: jnp.ndarray
    zbig_i: jnp.ndarray
    zbigs_i: jnp.ndarray
    ztail_i: jnp.ndarray
    ztails_i: jnp.ndarray


def _lane_rep_big(z: np.ndarray, R: int) -> np.ndarray:
    """First R entries of a zeta table, lane-replicated: [2, R, C] u32."""
    zr = z[:R]
    lo = (zr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (zr >> np.uint64(32)).astype(np.uint32)
    return np.stack([np.repeat(lo[:, None], _C, axis=1),
                     np.repeat(hi[:, None], _C, axis=1)])


def _tail_planes(z: np.ndarray, n: int, R: int, inverse: bool) -> np.ndarray:
    """[2, 128, R] u32: per-stage zeta planes Z[g, r] = z[nb + r*gpr + g],
    stage rows concatenated in execution order."""
    lens = [64, 32, 16, 8, 4, 2, 1]
    if inverse:
        lens = lens[::-1]
    rows_lo, rows_hi = [], []
    r_idx = np.arange(R)
    for ln in lens:
        gpr = _C // (2 * ln)
        nb = n // (2 * ln)
        for g in range(gpr):
            vals = z[nb + r_idx * gpr + g]
            rows_lo.append((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
            rows_hi.append((vals >> np.uint64(32)).astype(np.uint32))
    rows_lo.append(np.zeros(R, dtype=np.uint32))
    rows_hi.append(np.zeros(R, dtype=np.uint32))
    return np.stack([np.stack(rows_lo), np.stack(rows_hi)])


def _scal_rows(vals, width: int) -> np.ndarray:
    """[2, 8, width] lane-replicated scalar rows."""
    out = np.zeros((2, 8, width), dtype=np.uint32)
    for row, val in enumerate(vals):
        out[0, row, :] = val & 0xFFFFFFFF
        out[1, row, :] = (val >> 32) & 0xFFFFFFFF
    return out


def _to_std(zmont: np.ndarray, p: int) -> np.ndarray:
    """Montgomery-domain table (z*R mod p, R=2^64) -> standard domain."""
    rinv = pow(1 << 64, -1, p)
    return np.array([(int(z) * rinv) % p for z in zmont], dtype=np.uint64)


def _shoup(zstd: np.ndarray, p: int) -> np.ndarray:
    """Shoup companions floor(z << 64 / p)."""
    return np.array([(int(z) << 64) // p for z in zstd], dtype=np.uint64)


def _group_primes(arrs: list[np.ndarray], F: int) -> jnp.ndarray:
    """Stack per-prime tables [2, X, Y] -> [G, 2, F*X, Y], padding the prime
    count to a multiple of F by replicating the last prime's table (padded
    outputs are discarded by the wrapper)."""
    dim = len(arrs)
    dimp = ((dim + F - 1) // F) * F
    arrs = arrs + [arrs[-1]] * (dimp - dim)
    a = np.stack(arrs)                                    # [dimp, 2, X, Y]
    G = dimp // F
    a = a.reshape(G, F, 2, a.shape[2], a.shape[3]).transpose(0, 2, 1, 3, 4)
    return jnp.asarray(a.reshape(G, 2, F * a.shape[3], a.shape[4]))


def make_pallas_plan(pctx, dim: int, P: int = 1, F: int = 1) -> PallasNttPlan:
    n = pctx.n
    assert n >= 1024, "pallas NTT backend needs n >= 1024"
    R = n // _C
    scc, scr = [], []
    zbf, zbsf, ztf, ztsf = [], [], [], []
    zbi, zbsi, zti, ztsi = [], [], [], []
    basis = pctx.basis(dim)
    for d in range(dim):
        pc = pctx.prime_ctx[d]
        p = int(pc.p)
        ninv_std = int(_to_std(np.array([pc.ninv_mont], dtype=np.uint64), p)[0])
        ninv_sh = (ninv_std << 64) // p
        ninvph = ninv_std * int(basis.phat_invmp[d]) % p
        ninvph_sh = (ninvph << 64) // p
        scal = (p, 2 * p, 4 * p, ninv_std, ninv_sh, ninvph, ninvph_sh)
        scc.append(_scal_rows(scal, _C))
        scr.append(_scal_rows(scal, R))
        zf = _to_std(pc.zetas, p)
        zi = _to_std(pc.zetas_inv, p)
        zfs = _shoup(zf, p)
        zis = _shoup(zi, p)
        zbf.append(_lane_rep_big(zf, R))
        zbsf.append(_lane_rep_big(zfs, R))
        ztf.append(_tail_planes(zf, n, R, False))
        ztsf.append(_tail_planes(zfs, n, R, False))
        zbi.append(_lane_rep_big(zi, R))
        zbsi.append(_lane_rep_big(zis, R))
        zti.append(_tail_planes(zi, n, R, True))
        ztsi.append(_tail_planes(zis, n, R, True))
    dimp = ((dim + F - 1) // F) * F
    return PallasNttPlan(
        dim=dim, n=n, P=P, F=F, dimp=dimp,
        scc=_group_primes(scc, F), scr=_group_primes(scr, F),
        zbig_f=_group_primes(zbf, F), zbigs_f=_group_primes(zbsf, F),
        ztail_f=_group_primes(ztf, F), ztails_f=_group_primes(ztsf, F),
        zbig_i=_group_primes(zbi, F), zbigs_i=_group_primes(zbsi, F),
        ztail_i=_group_primes(zti, F), ztails_i=_group_primes(ztsi, F),
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
               interpret: bool | None = None, scaled: bool = False):
    """u64[dim, n] (plan.P == 1) or u64[P, dim, n] -> same shape.  One
    grid-free pallas call per F-prime group covering all P polys of the
    fold (identical kernels — XLA dedups the compilations); compose under
    jit.  scaled=True: INTT output additionally multiplied by phat^-1 per
    prime."""
    if interpret is None:
        interpret = INTERPRET
    P, F = plan.P, plan.F
    if P == 1:
        dim, n = a.shape
        R = n // _C
        a32 = _split(a, R)                              # [dim, 2, R, C]
        a32 = a32.reshape(dim, 2, R, _C)
    else:
        Pa, dim, n = a.shape
        assert Pa == P, (Pa, P)
        R = n // _C
        a32 = _split(a, R)                              # [P, dim, 2, R, C]
        a32 = a32.transpose(1, 2, 0, 3, 4).reshape(dim, 2, P * R, _C)
    dimp, G = plan.dimp, plan.dimp // F
    if dimp != dim:
        pad = [(0, dimp - dim), (0, 0), (0, 0), (0, 0)]
        a32 = jnp.pad(a32, pad)
    if F > 1:
        a32 = a32.reshape(G, F, 2, P * R, _C).transpose(0, 2, 1, 3, 4)
        a32 = a32.reshape(G, 2, F * P * R, _C)
    if inverse:
        zb, zbs = plan.zbig_i, plan.zbigs_i
        zt, zts = plan.ztail_i, plan.ztails_i
    else:
        zb, zbs = plan.zbig_f, plan.zbigs_f
        zt, zts = plan.ztail_f, plan.ztails_f
    kernel = functools.partial(_ntt_kernel, R, P, F, inverse, scaled)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, F * P * R, _C), jnp.uint32),
        interpret=interpret,
    )

    # one call site via lax.map -> a single Mosaic compilation for all groups
    def body(args):
        return call(*args)
    out = jax.lax.map(body, (a32, zb, zbs, zt, zts, plan.scc, plan.scr))
    if F > 1:
        out = out.reshape(G, 2, F, P * R, _C).transpose(0, 2, 1, 3, 4)
    out = out.reshape(dimp, 2, P * R, _C)[:dim]
    if P == 1:
        return _join(out, n)
    out = out.reshape(dim, 2, P, R, _C).transpose(2, 0, 1, 3, 4)
    return _join(out, n)
