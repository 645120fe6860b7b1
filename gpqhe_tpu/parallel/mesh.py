"""Multi-chip parallelism: (limb[, coeff], batch) device meshes for the RNS
pipeline.

The reference exposes four natural parallel axes but implements none
(SURVEY.md §2: pthread code compiled out, ref: src/rns.c:79-216).  Here they
become jax.sharding mesh axes:

  limb  — the per-prime d-loop of every heavy op (ref: src/poly.c:94-102):
          decompose / NTT / pointwise / INTT are embarrassingly parallel per
          prime; only the CRT reconstruction needs a psum over this axis
          (digit partial sums — reconstruct_core(axis_name=...)).
  coeff — the polynomial-coefficient axis (the reference's n-loops,
          ref: src/ntt.c:42-51): the long-sequence analogue.  The NTT's
          first log2(S) stages pair whole shards (one ppermute block swap
          per stage, riding ICI); all remaining stages are shard-local.
  batch — independent ciphertexts (pure data parallelism).

Collectives: log2(S) ppermutes per NTT on 'coeff'; one psum of
[batch, n/S, ds] f64 digits per CRT reconstruct on 'limb'.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..context import PolyContext
from ..ops import limbs as lb
from ..ops import rns as rns_ops
from ..ops.modmath import addmod, mont_mul, mulmod, submod
from ..ops.ntt import intt, ntt


def make_he_mesh(n_devices: int | None = None, limb: int | None = None) -> Mesh:
    """Create a (limb, batch) mesh over available devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if limb is None:
        limb = n_devices
        batch = 1
        while limb > 4 and limb % 2 == 0:
            limb //= 2
            batch *= 2
    else:
        batch = n_devices // limb
    mesh_devs = np.array(devs[:n_devices]).reshape(limb, batch)
    return Mesh(mesh_devs, axis_names=("limb", "batch"))


def build_sharded_poly_mul(pctx: PolyContext, dim: int, k_in: int,
                           mask_to_bits: int, k_out: int, mesh: Mesh):
    """Jitted batched negacyclic product sharded over (limb, batch).

    Returns fn(a, b) for u32[B, n, k_in] inputs (B sharded over 'batch');
    the dim primes are sharded over 'limb'.  dim must divide by the limb
    axis size.
    """
    nlimb = mesh.shape["limb"]
    assert dim % nlimb == 0, (dim, nlimb)
    b = pctx.basis(dim)
    plan = rns_ops.make_recon_plan(pctx, dim)
    w = rns_ops.make_decomp_weights(pctx, dim, k_in)

    consts = dict(
        ps=jnp.array(b.ps), pinv=jnp.array(b.pinv_mont),
        ninv=jnp.array(b.ninv_mont), r2=jnp.array(b.r2),
        phinv=jnp.array(b.phatinv_mont),
        w=jnp.asarray(w),
        zetas=jnp.array(pctx.zetas(dim)), zetas_inv=jnp.array(pctx.zetas_inv(dim)),
        phat_shift=jnp.asarray(rns_ops.phat_shift_table(plan)),
        inv_p=jnp.asarray(plan.inv_p),
        negP16=jnp.asarray(plan.negP16.astype(np.float64)),
        mmp=jnp.asarray(plan.MminusP_limbs), plimbs=jnp.asarray(plan.P_limbs),
        phalf=jnp.asarray(plan.Phalf_limbs),
    )
    const_specs = dict(
        ps=P("limb"), pinv=P("limb"), ninv=P("limb"), r2=P("limb"),
        phinv=P("limb"), w=P("limb", None),
        zetas=P("limb", None), zetas_inv=P("limb", None),
        phat_shift=P(None, "limb", None),
        inv_p=P("limb"),
        negP16=P(), mmp=P(), plimbs=P(), phalf=P(),
    )

    def kernel(a, bb, ps, pinv, ninv, r2, phinv, w, zetas, zetas_inv,
               phat_shift, inv_p, negP16, mmp, plimbs, phalf):
        # local primes of this shard
        ra = ntt(rns_ops.decompose_core(a, ps, pinv, w), zetas, ps, pinv)
        rb = ntt(rns_ops.decompose_core(bb, ps, pinv, w), zetas, ps, pinv)
        ch = mulmod(ra, rb, ps[:, None], pinv[:, None], r2[:, None])
        res = intt(ch, zetas_inv, ps, pinv, ninv)
        c = rns_ops.reconstruct_core(
            res, ps, pinv, phinv, phat_shift, inv_p, negP16,
            mmp, plimbs, phalf, ks=plan.ks, dim_total=dim,
            center=True, axis_name="limb")
        return lb.fit_signed(c, mask_to_bits, k_out)

    smapped = shard_map(
        kernel, mesh=mesh,
        in_specs=(P("batch", None, None), P("batch", None, None),
                  *const_specs.values()),
        out_specs=P("batch", None, None),
        check_rep=False,
    )

    @jax.jit
    def f(a, bb):
        return smapped(a, bb, *consts.values())
    return f


def shard_ciphertext_batch(mesh: Mesh, arr):
    """Place a [B, n, K] batch with B sharded over 'batch', replicated on 'limb'."""
    return jax.device_put(arr, NamedSharding(mesh, P("batch", None, None)))


# ---------------------------------------------------------------------------
# coefficient-axis NTT sharding (the long-sequence analogue, SURVEY.md §5)
# ---------------------------------------------------------------------------

def make_coeff_ntt_plan(pctx: PolyContext, dim: int, S: int) -> dict:
    """Host precompute for the coefficient-sharded NTT over S shards.

    Shard s holds the contiguous coefficient block [s*L, (s+1)*L), L = n/S.
    Stages with butterfly length >= L pair whole shards (partner = s XOR
    length/L, since blocks are shard-aligned) and use ONE zeta per
    (prime, stage, shard); stages with length < L are local and run the
    unmodified ntt()/intt() kernels over per-shard repacked zeta tables
    laid out exactly like the global ones (zl[nb:2nb] = stage-nb zetas).
    Twiddle indexing follows the reference tables (ref: src/ntt.c:37-73,
    src/precomp.c:244-264).
    """
    n = pctx.n
    assert S & (S - 1) == 0 and S >= 1
    L = n // S
    assert L >= 2, "need at least one local butterfly stage per shard"
    z = np.asarray(pctx.zetas(dim))          # [dim, n]
    zi = np.asarray(pctx.zetas_inv(dim))
    logS = S.bit_length() - 1

    # local tables: zl[d, s, j], layout zl[..., nb:2nb] = shard-s stage zetas
    def local_tables(tab):
        out = np.zeros((dim, S, L), dtype=np.uint64)
        nb = 1
        while nb <= L // 2:
            for s in range(S):
                out[:, s, nb:2 * nb] = tab[:, S * nb + s * nb: S * nb + (s + 1) * nb]
            nb *= 2
        return out

    # cross-stage zetas: forward lengths n/2 ... L (descending),
    # inverse lengths L ... n/2 (ascending); block(s) = s*L // (2*length)
    def cross_tables(tab, lengths):
        out = np.zeros((dim, max(1, logS), S), dtype=np.uint64)
        for t, length in enumerate(lengths):
            nblocks = n // (2 * length)
            for s in range(S):
                out[:, t, s] = tab[:, nblocks + (s * L) // (2 * length)]
        return out

    f_lengths = [n >> (1 + t) for t in range(logS)]          # n/2 ... L
    i_lengths = f_lengths[::-1]                              # L ... n/2
    return dict(
        S=S, L=L, logS=logS,
        f_lengths=f_lengths, i_lengths=i_lengths,
        zl_f=local_tables(z), zl_i=local_tables(zi),
        zc_f=cross_tables(z, f_lengths), zc_i=cross_tables(zi, i_lengths),
    )


def _ntt_coeff_sharded(x, zl, zc, ps, pinv, plan, axis: str):
    """Forward NTT on a local [dim, L] coefficient block under shard_map.
    Cross stages first (one ppermute block swap each), then local stages."""
    S = plan["S"]
    p = ps[:, None]
    pv = pinv[:, None]
    s_idx = jax.lax.axis_index(axis)
    for t, length in enumerate(plan["f_lengths"]):
        d = length // plan["L"]
        recv = jax.lax.ppermute(x, axis, [(i, i ^ d) for i in range(S)])
        lower = (s_idx & d) == 0
        zt = zc[:, t, 0][:, None]
        tmul = mont_mul(jnp.where(lower, recv, x), zt, p, pv)
        x = jnp.where(lower, addmod(x, tmul, p), submod(recv, tmul, p))
    return ntt(x, zl[:, 0], ps, pinv)


def _intt_coeff_sharded(x, zl, zc, ps, pinv, ninv, plan, axis: str):
    """Inverse NTT on a local [dim, L] block: local GS stages (with the
    global n^-1 scale — a scalar multiply commutes with later butterflies),
    then cross stages ascending."""
    S = plan["S"]
    p = ps[:, None]
    pv = pinv[:, None]
    x = intt(x, zl[:, 0], ps, pinv, ninv)
    s_idx = jax.lax.axis_index(axis)
    for t, length in enumerate(plan["i_lengths"]):
        d = length // plan["L"]
        recv = jax.lax.ppermute(x, axis, [(i, i ^ d) for i in range(S)])
        lower = (s_idx & d) == 0
        zt = zc[:, t, 0][:, None]
        y_add = addmod(x, recv, p)
        y_sub = mont_mul(submod(recv, x, p), zt, p, pv)
        x = jnp.where(lower, y_add, y_sub)
    return x


def make_he_mesh3(n_devices: int | None = None, limb: int = 1,
                  coeff: int = 1) -> Mesh:
    """Create a (limb, coeff, batch) mesh over available devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    batch = n_devices // (limb * coeff)
    assert limb * coeff * batch == n_devices, (n_devices, limb, coeff)
    mesh_devs = np.array(devs[:n_devices]).reshape(limb, coeff, batch)
    return Mesh(mesh_devs, axis_names=("limb", "coeff", "batch"))


def build_sharded_poly_mul_3d(pctx: PolyContext, dim: int, k_in: int,
                              mask_to_bits: int, k_out: int, mesh: Mesh):
    """Negacyclic product sharded over the full (limb, coeff, batch) mesh.

    fn(a, b) for u32[B, n, k_in] inputs; B shards over 'batch', the n
    coefficients over 'coeff', the dim primes over 'limb'.  Per NTT the
    'coeff' axis exchanges log2(S) ppermuted blocks; the CRT lift psums
    digit partials over 'limb'; everything else is local.
    """
    nlimb = mesh.shape["limb"]
    S = mesh.shape["coeff"]
    assert dim % nlimb == 0, (dim, nlimb)
    b = pctx.basis(dim)
    plan = rns_ops.make_recon_plan(pctx, dim)
    w = rns_ops.make_decomp_weights(pctx, dim, k_in)
    cp = make_coeff_ntt_plan(pctx, dim, S)
    splan = dict(S=S, L=cp["L"], logS=cp["logS"],
                 f_lengths=cp["f_lengths"], i_lengths=cp["i_lengths"])

    consts = dict(
        ps=jnp.array(b.ps), pinv=jnp.array(b.pinv_mont),
        ninv=jnp.array(b.ninv_mont), r2=jnp.array(b.r2),
        phinv=jnp.array(b.phatinv_mont),
        w=jnp.asarray(w),
        zl_f=jnp.asarray(cp["zl_f"]), zl_i=jnp.asarray(cp["zl_i"]),
        zc_f=jnp.asarray(cp["zc_f"]), zc_i=jnp.asarray(cp["zc_i"]),
        phat_shift=jnp.asarray(rns_ops.phat_shift_table(plan)),
        inv_p=jnp.asarray(plan.inv_p),
        negP16=jnp.asarray(plan.negP16.astype(np.float64)),
        mmp=jnp.asarray(plan.MminusP_limbs), plimbs=jnp.asarray(plan.P_limbs),
        phalf=jnp.asarray(plan.Phalf_limbs),
    )
    const_specs = dict(
        ps=P("limb"), pinv=P("limb"), ninv=P("limb"), r2=P("limb"),
        phinv=P("limb"), w=P("limb", None),
        zl_f=P("limb", "coeff", None), zl_i=P("limb", "coeff", None),
        zc_f=P("limb", None, "coeff"), zc_i=P("limb", None, "coeff"),
        phat_shift=P(None, "limb", None),
        inv_p=P("limb"),
        negP16=P(), mmp=P(), plimbs=P(), phalf=P(),
    )

    def kernel(a, bb, ps, pinv, ninv, r2, phinv, w, zl_f, zl_i, zc_f, zc_i,
               phat_shift, inv_p, negP16, mmp, plimbs, phalf):
        def fwd(x):
            res = rns_ops.decompose_core(x, ps, pinv, w)
            return _ntt_coeff_sharded(res, zl_f, zc_f, ps, pinv, splan, "coeff")
        ra, rb = fwd(a), fwd(bb)
        ch = mulmod(ra, rb, ps[:, None], pinv[:, None], r2[:, None])
        res = _intt_coeff_sharded(ch, zl_i, zc_i, ps, pinv, ninv, splan, "coeff")
        c = rns_ops.reconstruct_core(
            res, ps, pinv, phinv, phat_shift, inv_p, negP16,
            mmp, plimbs, phalf, ks=plan.ks, dim_total=dim,
            center=True, axis_name="limb")
        return lb.fit_signed(c, mask_to_bits, k_out)

    def vkernel(a, bb, *cs):
        # batch loop stays on-device: map the per-ciphertext kernel
        return jax.vmap(lambda x, y: kernel(x, y, *cs))(a, bb)

    smapped = shard_map(
        vkernel, mesh=mesh,
        in_specs=(P("batch", "coeff", None), P("batch", "coeff", None),
                  *const_specs.values()),
        out_specs=P("batch", "coeff", None),
        check_rep=False,
    )

    @jax.jit
    def f(a, bb):
        return smapped(a, bb, *consts.values())
    return f
