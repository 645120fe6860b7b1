"""Pallas TPU kernel: single-word u32 negacyclic NTT/INTT for logp<=29 chains.

The u64-emulating kernel (ops/ntt_pallas.py) pays ~162 VPU ops per lazy
butterfly — 24 32x32 multiplies plus u32-PAIR carry chains — because the
reference-parity chain uses 59-bit primes.  The RNS basis, however, is an
internal implementation choice: ciphertext bytes depend on the basis only
through P = prod(primes) (the key-switch raise modulus, ref:
src/he-kem.c:89-90, he-mult.c:70-77), and ANY valid prime chain yields an
exact CKKS instantiation.  A 29-bit chain (p = 2^29+1+k*2n, p < 2^30 so
4p < 2^32) doubles dim but collapses every butterfly to single-word u32
arithmetic:

    q  = mulhi32(x, z')          # z' = floor(z * 2^32 / p), exact hi via
                                 #   4 16-bit partial products
    r  = x*z - q*p  (mod 2^32)   # r in [0, 3p): q >= floor(xz/p) - 2
    r -= 2p if r >= 2p           # r < 2p

~23 ops / 6 multiplies per butterfly — 6x fewer than the pair kernel — at
2x the prime count: ~3x net.  Lazy invariant: coefficients < 4p through the
forward stages (one 2p-cond-sub on x0 per butterfly); the inverse GS
butterfly cond-subs BOTH inputs to < 2p first (8p would overflow u32),
giving s = x0+x1 < 4p and d = x0+2p-x1 < 4p.  Outputs reduce exactly to
[0, p), so results are BIT-IDENTICAL to the 'butterfly' backend over the
same chain (ref: src/ntt.c:37-73 evaluation order).

Data layout mirrors ops/ntt_pallas.py exactly (poly slab M[R, 128], P-poly x
F-prime folds, big stages on rows / tail stages on the transpose, stage
PAIRS fused radix-4 style) minus the lo/hi plane axis.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_pallas import _to_std

_C = 128
_M16 = 0xFFFF
_16 = 16


def _mulhi32(a, b):
    """Exact high 32 bits of a 32x32 product via 16-bit partials."""
    al = a & _M16
    ah = a >> _16
    bl = b & _M16
    bh = b >> _16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    cross = (ll >> _16) + (lh & _M16) + (hl & _M16)
    return ah * bh + (lh >> _16) + (hl >> _16) + (cross >> _16)


def _shoup32(x, z, zs, p, p2):
    """x * z mod p, lazily (< 2p), any u32 x; p < 2^30."""
    q = _mulhi32(x, zs)
    r = x * z - q * p
    return jnp.where(r >= p2, r - p2, r)


def _cond_sub32(x, m):
    return jnp.where(x >= m, x - m, x)


def _fwd_bf32(x0, x1, z, zs, sc):
    """Lazy CT butterfly: inputs < 4p, outputs < 4p."""
    p, p2, p4 = sc
    x0 = _cond_sub32(x0, p2)                 # < 2p
    t = _shoup32(x1, z, zs, p, p2)           # < 2p
    return x0 + t, x0 + p2 - t               # < 4p each


def _inv_bf32(x0, x1, z, zs, sc):
    """Lazy GS butterfly: inputs < 4p, outputs y0 < 4p, y1 < 2p.
    Both inputs cond-sub to < 2p first (x0 + x1 at < 4p each would
    overflow u32 for p just above 2^29)."""
    p, p2, p4 = sc
    x0 = _cond_sub32(x0, p2)
    x1 = _cond_sub32(x1, p2)
    y0 = x0 + x1                             # < 4p
    d = x0 + p2 - x1                         # in (0, 4p)
    return y0, _shoup32(d, z, zs, p, p2)


def _big_stages32(a, zb, zbs, sc, R, inverse):
    """Stages with len >= 128 on one poly slab M[R, C]; FORWARD stage pairs
    fused (see ops/ntt_pallas.py _big_stages for the routing derivation and
    why inverse stages stay unfused — Mosaic compile pathology)."""
    Ls = []
    L = R // 2
    while L >= 1:
        Ls.append(L)
        L //= 2
    if inverse:
        Ls = Ls[::-1]
    bf = _inv_bf32 if inverse else _fwd_bf32

    def zsl(start, cnt, group):
        return (zb[start:start + cnt, :].reshape(cnt // group, group, _C),
                zbs[start:start + cnt, :].reshape(cnt // group, group, _C))

    i = 0
    while i < len(Ls):
        fuse = i + 1 < len(Ls) and not inverse
        if fuse:
            L = Ls[i]
            h = L // 2
            nb = R // (2 * L)
            x = a.reshape(nb, 4, h, _C)
            zA, zAs = zsl(nb, nb, 1)
            zB, zBs = zsl(2 * nb, 2 * nb, 2)
            a0, a2 = bf(x[:, 0], x[:, 2], zA, zAs, sc)
            a1, a3 = bf(x[:, 1], x[:, 3], zA, zAs, sc)
            b0, b1 = bf(a0, a1, zB[:, 0:1], zBs[:, 0:1], sc)
            b2, b3 = bf(a2, a3, zB[:, 1:2], zBs[:, 1:2], sc)
            a = jnp.concatenate([b0, b1, b2, b3], axis=1).reshape(R, _C)
            i += 2
        else:
            L = Ls[i]
            nb = R // (2 * L)
            x0 = a.reshape(nb, 2 * L, _C)[:, :L, :]
            x1 = a.reshape(nb, 2 * L, _C)[:, L:, :]
            z, zs = zsl(nb, nb, 1)
            y0, y1 = bf(x0, x1, z, zs, sc)
            a = jnp.concatenate([y0, y1], axis=1).reshape(R, _C)
            i += 1
    return a


def _tail_stages32(t, zt, zts, sc, W, inverse):
    """Stages with len < 128 on M^T [C, W]; stage pairs fused."""
    lens = [64, 32, 16, 8, 4, 2, 1]
    if inverse:
        lens = lens[::-1]
    bf = _inv_bf32 if inverse else _fwd_bf32

    offs = []
    off = 0
    for ln in lens:
        offs.append(off)
        off += _C // (2 * ln)

    def zpl(off_, cnt, group):
        return (zt[off_:off_ + cnt, :].reshape(cnt // group, group, W),
                zts[off_:off_ + cnt, :].reshape(cnt // group, group, W))

    i = 0
    while i < len(lens):
        fuse = i + 1 < len(lens) and not inverse
        if fuse:
            ln = lens[i]
            h = ln // 2
            g = _C // (2 * ln)
            x = t.reshape(g, 4, h, W)
            zA, zAs = zpl(offs[i], g, 1)
            zB, zBs = zpl(offs[i + 1], 2 * g, 2)
            a0, a2 = bf(x[:, 0], x[:, 2], zA, zAs, sc)
            a1, a3 = bf(x[:, 1], x[:, 3], zA, zAs, sc)
            b0, b1 = bf(a0, a1, zB[:, 0:1], zBs[:, 0:1], sc)
            b2, b3 = bf(a2, a3, zB[:, 1:2], zBs[:, 1:2], sc)
            t = jnp.concatenate([b0, b1, b2, b3], axis=1).reshape(_C, W)
            i += 2
        else:
            ln = lens[i]
            gpr = _C // (2 * ln)
            x0 = t.reshape(gpr, 2 * ln, W)[:, :ln, :]
            x1 = t.reshape(gpr, 2 * ln, W)[:, ln:, :]
            z, zs = zpl(offs[i], gpr, 1)
            y0, y1 = bf(x0, x1, z, zs, sc)
            t = jnp.concatenate([y0, y1], axis=1).reshape(_C, W)
            i += 1
    return t


def _ntt32_kernel(R: int, P: int, F: int, inverse: bool, scaled: bool,
                  a_ref, zb_ref, zbs_ref, zt_ref, zts_ref, scc_ref, scr_ref,
                  out_ref):
    """Grid-free kernel over an (F-prime x P-poly) fold; single u32 plane.
    a_ref [F*P*R, C]; per-prime tables stack along rows: zb [F*R, C],
    zt [F*128, R]; scalars scc/scr rows (f*8 + row) =
    (p, 2p, 4p, ninv, ninv', ninvphat, ninvphat')."""
    for f in range(F):
        zb = zb_ref[f * R:(f + 1) * R, :]
        zbs = zbs_ref[f * R:(f + 1) * R, :]
        zt = zt_ref[f * _C:(f + 1) * _C, :]
        zts = zts_ref[f * _C:(f + 1) * _C, :]
        scc = scc_ref[f * 8:(f + 1) * 8, :]
        scr = scr_ref[f * 8:(f + 1) * 8, :]
        sc_c = (scc[0:1, :], scc[1:2, :], scc[2:3, :])
        sc_r = (scr[0:1, :], scr[1:2, :], scr[2:3, :])
        srow = 5 if scaled else 3
        nv = scc[srow:srow + 1, :]
        nvs = scc[srow + 1:srow + 2, :]
        for j in range(P):
            row = (f * P + j) * R
            a = a_ref[row:row + R, :]
            if not inverse:
                a = _big_stages32(a, zb, zbs, sc_c, R, False)
                t = a.T
                t = _tail_stages32(t, zt, zts, sc_r, R, False)
                t = _cond_sub32(t, sc_r[1])          # < 2p
                t = _cond_sub32(t, sc_r[0])          # < p
                a = t.T
            else:
                t = a.T
                t = _tail_stages32(t, zt, zts, sc_r, R, True)
                a = t.T
                a = _big_stages32(a, zb, zbs, sc_c, R, True)
                a = _shoup32(a, nv, nvs, sc_c[0], sc_c[1])
                a = _cond_sub32(a, sc_c[0])
            out_ref[row:row + R, :] = a


@dataclass(frozen=True)
class PallasNtt32Plan:
    dim: int
    n: int
    P: int
    F: int
    dimp: int
    scc: jnp.ndarray        # u32[G, F*8, C]
    scr: jnp.ndarray        # u32[G, F*8, R]
    zbig_f: jnp.ndarray     # u32[G, F*R, C] standard-domain zetas
    zbigs_f: jnp.ndarray    # u32[G, F*R, C] Shoup-32 companions
    ztail_f: jnp.ndarray    # u32[G, F*128, R]
    ztails_f: jnp.ndarray
    zbig_i: jnp.ndarray
    zbigs_i: jnp.ndarray
    ztail_i: jnp.ndarray
    ztails_i: jnp.ndarray


def _shoup32_table(zstd: np.ndarray, p: int) -> np.ndarray:
    return np.array([(int(z) << 32) // p for z in zstd], dtype=np.uint32)


def _lane_rep32(z: np.ndarray, R: int) -> np.ndarray:
    return np.repeat(z[:R, None].astype(np.uint32), _C, axis=1)


def _tail_planes32(z: np.ndarray, n: int, R: int, inverse: bool) -> np.ndarray:
    lens = [64, 32, 16, 8, 4, 2, 1]
    if inverse:
        lens = lens[::-1]
    rows = []
    r_idx = np.arange(R)
    for ln in lens:
        gpr = _C // (2 * ln)
        nb = n // (2 * ln)
        for g in range(gpr):
            rows.append(z[nb + r_idx * gpr + g].astype(np.uint32))
    rows.append(np.zeros(R, dtype=np.uint32))
    return np.stack(rows)


def _scal_rows32(vals, width: int) -> np.ndarray:
    out = np.zeros((8, width), dtype=np.uint32)
    for row, val in enumerate(vals):
        out[row, :] = val & 0xFFFFFFFF
    return out


def _group32(arrs: list[np.ndarray], F: int) -> jnp.ndarray:
    """[dim] list of [X, Y] -> [G, F*X, Y], padding dim to a multiple of F."""
    dim = len(arrs)
    dimp = ((dim + F - 1) // F) * F
    arrs = arrs + [arrs[-1]] * (dimp - dim)
    a = np.stack(arrs)                       # [dimp, X, Y]
    G = dimp // F
    return jnp.asarray(a.reshape(G, F * a.shape[1], a.shape[2]))


def make_pallas32_plan(pctx, dim: int, P: int = 1, F: int = 1) -> PallasNtt32Plan:
    n = pctx.n
    assert n >= 1024, "pallas NTT backend needs n >= 1024"
    assert max(pctx.primes[:dim]) < (1 << 30), \
        "u32 kernel needs p < 2^30 (4p < 2^32); use a logp<=29 chain"
    R = n // _C
    scc, scr = [], []
    zbf, zbsf, ztf, ztsf = [], [], [], []
    zbi, zbsi, zti, ztsi = [], [], [], []
    basis = pctx.basis(dim)
    for d in range(dim):
        pc = pctx.prime_ctx[d]
        p = int(pc.p)
        ninv_std = int(_to_std(np.array([pc.ninv_mont], dtype=np.uint64), p)[0])
        ninv_sh = (ninv_std << 32) // p
        ninvph = ninv_std * int(basis.phat_invmp[d]) % p
        ninvph_sh = (ninvph << 32) // p
        scal = (p, 2 * p, 4 * p, ninv_std, ninv_sh, ninvph, ninvph_sh)
        scc.append(_scal_rows32(scal, _C))
        scr.append(_scal_rows32(scal, R))
        zf = _to_std(pc.zetas, p)
        zi = _to_std(pc.zetas_inv, p)
        zfs = _shoup32_table(zf, p)
        zis = _shoup32_table(zi, p)
        zbf.append(_lane_rep32(zf, R))
        zbsf.append(_lane_rep32(zfs, R))
        ztf.append(_tail_planes32(zf, n, R, False))
        ztsf.append(_tail_planes32(zfs, n, R, False))
        zbi.append(_lane_rep32(zi, R))
        zbsi.append(_lane_rep32(zis, R))
        zti.append(_tail_planes32(zi, n, R, True))
        ztsi.append(_tail_planes32(zis, n, R, True))
    dimp = ((dim + F - 1) // F) * F
    return PallasNtt32Plan(
        dim=dim, n=n, P=P, F=F, dimp=dimp,
        scc=_group32(scc, F), scr=_group32(scr, F),
        zbig_f=_group32(zbf, F), zbigs_f=_group32(zbsf, F),
        ztail_f=_group32(ztf, F), ztails_f=_group32(ztsf, F),
        zbig_i=_group32(zbi, F), zbigs_i=_group32(zbsi, F),
        ztail_i=_group32(zti, F), ztails_i=_group32(ztsi, F),
    )


def ntt_pallas32(a, plan: PallasNtt32Plan, inverse: bool = False,
                 interpret: bool | None = None, scaled: bool = False):
    """u64[dim, n] (plan.P == 1) or u64[P, dim, n] -> same shape/dtype
    (values < p < 2^30; the u64<->u32 casts bracket the kernel)."""
    from . import ntt_pallas as np64
    if interpret is None:
        interpret = np64.INTERPRET
    P, F = plan.P, plan.F
    if P == 1:
        dim, n = a.shape
        R = n // _C
        a32 = a.astype(jnp.uint32).reshape(dim, R, _C)
    else:
        Pa, dim, n = a.shape
        assert Pa == P, (Pa, P)
        R = n // _C
        a32 = a.astype(jnp.uint32).reshape(P, dim, R, _C)
        a32 = a32.transpose(1, 0, 2, 3).reshape(dim, P * R, _C)
    dimp, G = plan.dimp, plan.dimp // F
    if dimp != dim:
        a32 = jnp.pad(a32, [(0, dimp - dim), (0, 0), (0, 0)])
    if F > 1:
        a32 = a32.reshape(G, F, P * R, _C).reshape(G, F * P * R, _C)
    else:
        a32 = a32.reshape(G, P * R, _C)
    if inverse:
        zb, zbs = plan.zbig_i, plan.zbigs_i
        zt, zts = plan.ztail_i, plan.ztails_i
    else:
        zb, zbs = plan.zbig_f, plan.zbigs_f
        zt, zts = plan.ztail_f, plan.ztails_f
    kernel = functools.partial(_ntt32_kernel, R, P, F, inverse, scaled)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F * P * R, _C), jnp.uint32),
        interpret=interpret,
    )

    def body(args):
        return call(*args)
    out = jax.lax.map(body, (a32, zb, zbs, zt, zts, plan.scc, plan.scr))
    out = out.reshape(dimp, P * R, _C)[:dim]
    if P == 1:
        return out.reshape(dim, n).astype(jnp.uint64)
    out = out.reshape(dim, P, R, _C).transpose(1, 0, 2, 3)
    return out.reshape(P, dim, n).astype(jnp.uint64)
