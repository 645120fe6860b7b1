"""Multi-chip parallelism: (limb, batch) device mesh for the RNS pipeline.

The reference exposes four natural parallel axes but implements none
(SURVEY.md §2: pthread code compiled out, ref: src/rns.c:79-216).  Here they
become jax.sharding mesh axes:

  limb  — the per-prime d-loop of every heavy op (ref: src/poly.c:94-102):
          decompose / NTT / pointwise / INTT are embarrassingly parallel per
          prime; only the CRT reconstruction needs a psum over this axis
          (digit partial sums — reconstruct_core(axis_name=...)).
  batch — independent ciphertexts (pure data parallelism).

Collectives ride ICI: one psum of [batch, n, ds] f64 digits per reconstruct.
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
from ..ops.modmath import mulmod
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
