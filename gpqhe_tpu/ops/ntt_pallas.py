"""Pallas TPU kernel: fused negacyclic NTT/INTT, all stages in VMEM.

The jnp butterfly path (ops/ntt.py) materializes every stage through XLA's
u64 emulation.  This kernel keeps one prime's full residue vector in VMEM as
u32 (lo, hi) planes and runs all logn stages in-register/VMEM, with the
Montgomery arithmetic written directly in u32 (16-bit partial products), so
no generic 64-bit emulation is involved.

Layout: residues u64[dim, n] are bitcast to lo/hi u32[dim, n] outside the
kernel; grid = (dim,); each program transforms one prime's vector.
Zetas enter as the same (lo, hi) u32 split; p and pinv as u32 pairs in SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# plain python scalars: jnp constants would be captured as kernel consts
_M16 = 0xFFFF
_16 = 16


def _mulhilo32(a, b):
    """Full 64-bit product of u32 a, b as (hi, lo) u32 — 16-bit partials."""
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
    """Low 64 bits of (a*b) as (lo, hi) u32."""
    h0, l0 = _mulhilo32(alo, blo)
    lo = l0
    hi = h0 + alo * bhi + ahi * blo
    return lo, hi


def _mul64_hi(alo, ahi, blo, bhi):
    """High 64 bits of the 128-bit product a*b, as (lo, hi) u32."""
    # partial products: a = ah*2^32+al, b = bh*2^32+bl
    h_ll, l_ll = _mulhilo32(alo, blo)          # al*bl
    h_lh, l_lh = _mulhilo32(alo, bhi)          # al*bh  (<<32)
    h_hl, l_hl = _mulhilo32(ahi, blo)          # ah*bl  (<<32)
    h_hh, l_hh = _mulhilo32(ahi, bhi)          # ah*bh  (<<64)
    # carry of bits 32..63: h_ll + l_lh + l_hl
    c_lo = h_ll + l_lh
    c1 = (c_lo < l_lh).astype(jnp.uint32)
    c_lo2 = c_lo + l_hl
    c2 = (c_lo2 < l_hl).astype(jnp.uint32)
    carry32 = c1 + c2
    # bits 64..95: l_hh + h_lh + h_hl + carry32
    r_lo = l_hh + h_lh
    d1 = (r_lo < h_lh).astype(jnp.uint32)
    r_lo2 = r_lo + h_hl
    d2 = (r_lo2 < h_hl).astype(jnp.uint32)
    r_lo3 = r_lo2 + carry32
    d3 = (r_lo3 < carry32).astype(jnp.uint32)
    r_hi = h_hh + d1 + d2 + d3
    return r_lo3, r_hi


def _mont_mul_u32(alo, ahi, blo, bhi, plo, phi, vlo, vhi):
    """Montgomery a*b*R^-1 mod p, R=2^64, all as u32 pairs (ref semantics:
    src/reduce.c:59-66).  Requires a*b < R*p."""
    m_lo, m_hi = _mul64_lo(alo, ahi, blo, bhi)          # ab mod 2^64
    t_lo, t_hi = _mul64_hi(alo, ahi, blo, bhi)          # ab >> 64
    u_lo, u_hi = _mul64_lo(m_lo, m_hi, vlo, vhi)        # u = m*pinv mod 2^64
    s_lo, s_hi = _mul64_hi(u_lo, u_hi, plo, phi)        # hi64(u*p)
    # r = t - s (+p on borrow)
    borrow = (t_hi < s_hi) | ((t_hi == s_hi) & (t_lo < s_lo))
    r_lo, r_hi = _sub64(t_lo, t_hi, s_lo, s_hi)
    a_lo, a_hi = _add64(r_lo, r_hi, plo, phi)
    return (jnp.where(borrow, a_lo, r_lo), jnp.where(borrow, a_hi, r_hi))


def _addmod_u32(alo, ahi, blo, bhi, plo, phi):
    s_lo, s_hi = _add64(alo, ahi, blo, bhi)
    ge = (s_hi > phi) | ((s_hi == phi) & (s_lo >= plo))
    d_lo, d_hi = _sub64(s_lo, s_hi, plo, phi)
    return jnp.where(ge, d_lo, s_lo), jnp.where(ge, d_hi, s_hi)


def _submod_u32(alo, ahi, blo, bhi, plo, phi):
    lt = (ahi < bhi) | ((ahi == bhi) & (alo < blo))
    d_lo, d_hi = _sub64(alo, ahi, blo, bhi)
    a_lo, a_hi = _add64(d_lo, d_hi, plo, phi)
    return jnp.where(lt, a_lo, d_lo), jnp.where(lt, a_hi, d_hi)


def _ntt_kernel(n: int, inverse: bool,
                scal_ref, a_ref, z_ref, out_ref):
    """One prime's NTT.  scal: u32[4] = (p_lo, p_hi, pinv_lo, pinv_hi) SMEM;
    a/z/out: u32[2, n] VMEM (plane 0 = lo, 1 = hi)."""
    plo = scal_ref[0]
    phi = scal_ref[1]
    vlo = scal_ref[2]
    vhi = scal_ref[3]
    alo = a_ref[0, :]
    ahi = a_ref[1, :]
    ln = n.bit_length() - 1

    if not inverse:
        length = n // 2
        while length >= 1:
            nblocks = n // (2 * length)
            x0l = alo.reshape(nblocks, 2, length)[:, 0, :]
            x0h = ahi.reshape(nblocks, 2, length)[:, 0, :]
            x1l = alo.reshape(nblocks, 2, length)[:, 1, :]
            x1h = ahi.reshape(nblocks, 2, length)[:, 1, :]
            zl = z_ref[0, pl.ds(nblocks, nblocks)].reshape(nblocks, 1)
            zh = z_ref[1, pl.ds(nblocks, nblocks)].reshape(nblocks, 1)
            tl, th = _mont_mul_u32(x1l, x1h, zl, zh, plo, phi, vlo, vhi)
            y0l, y0h = _addmod_u32(x0l, x0h, tl, th, plo, phi)
            y1l, y1h = _submod_u32(x0l, x0h, tl, th, plo, phi)
            alo = jnp.stack([y0l, y1l], axis=1).reshape(n)
            ahi = jnp.stack([y0h, y1h], axis=1).reshape(n)
            length //= 2
    else:
        length = 1
        while length <= n // 2:
            nblocks = n // (2 * length)
            x0l = alo.reshape(nblocks, 2, length)[:, 0, :]
            x0h = ahi.reshape(nblocks, 2, length)[:, 0, :]
            x1l = alo.reshape(nblocks, 2, length)[:, 1, :]
            x1h = ahi.reshape(nblocks, 2, length)[:, 1, :]
            zl = z_ref[0, pl.ds(nblocks, nblocks)].reshape(nblocks, 1)
            zh = z_ref[1, pl.ds(nblocks, nblocks)].reshape(nblocks, 1)
            y0l, y0h = _addmod_u32(x0l, x0h, x1l, x1h, plo, phi)
            dl, dh = _submod_u32(x0l, x0h, x1l, x1h, plo, phi)
            y1l, y1h = _mont_mul_u32(dl, dh, zl, zh, plo, phi, vlo, vhi)
            alo = jnp.stack([y0l, y1l], axis=1).reshape(n)
            ahi = jnp.stack([y0h, y1h], axis=1).reshape(n)
            length *= 2
        # final n^-1 scaling: ninv stored at z_ref[:, 0]
        nl = z_ref[0, 0]
        nh = z_ref[1, 0]
        alo, ahi = _mont_mul_u32(alo, ahi, nl, nh, plo, phi, vlo, vhi)
    del ln
    out_ref[0, :] = alo
    out_ref[1, :] = ahi


def _split_u64(x):
    return jnp.stack([(x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                      (x >> jnp.uint64(32)).astype(jnp.uint32)], axis=-2)


def _join_u64(x):
    return x[..., 0, :].astype(jnp.uint64) | (x[..., 1, :].astype(jnp.uint64) << jnp.uint64(32))


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def ntt_pallas(a, zetas, ps, pinv, ninv_mont=None, inverse: bool = False,
               interpret: bool = False):
    """Batched NTT via the Pallas kernel.

    a: u64[dim, n]; zetas u64[dim, n] (for inverse, slot 0 must hold
    ninv_mont — pass ninv_mont to have it patched in); ps/pinv u64[dim].
    """
    dim, n = a.shape
    if inverse and ninv_mont is not None:
        zetas = zetas.at[:, 0].set(ninv_mont)
    a32 = _split_u64(a)                     # [dim, 2, n]
    z32 = _split_u64(zetas)
    scal = jnp.stack([
        (ps & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
        (ps >> jnp.uint64(32)).astype(jnp.uint32),
        (pinv & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
        (pinv >> jnp.uint64(32)).astype(jnp.uint32),
    ], axis=-1)                              # [dim, 4]

    kernel = functools.partial(_ntt_kernel, n, inverse)
    out = pl.pallas_call(
        kernel,
        grid=(dim,),
        in_specs=[
            pl.BlockSpec((None, 4), lambda d: (d, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 2, n), lambda d: (d, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 2, n), lambda d: (d, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 2, n), lambda d: (d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dim, 2, n), jnp.uint32),
        interpret=interpret,
    )(scal, a32, z32)
    return _join_u64(out)
