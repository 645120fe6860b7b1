"""Ring engine: jitted device composites over R_q = Z_q[X]/(X^n + 1).

TPU-native replacement for the reference's poly.c hot path
(ref: src/poly.c:84-120).  Polynomials are u32-limb tensors [n, K]
(see gpqhe_tpu.ops.limbs); products run decompose -> NTT -> pointwise ->
INTT -> CRT-reconstruct entirely on device, one fused jit program per
static shape signature.

Key semantic invariant (why masking replaces big-int smod): every ciphertext
modulus is q_l = 2^logq_l (the reference builds the ladder by dividing
q = 1 << logq by Delta = 2^logDelta, ref: tests/gpqhe.c:1349-1352,
src/precomp.c:386-409), and 2^(32K) is then a multiple of q_l, so two's-
complement limb arithmetic mod 2^(32K) preserves values mod q_l.  All RNS
dimension formulas still cover the (slightly larger) representative
magnitudes — see dim_* in context.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..context import PolyContext
from ..utils.xla import tpu_jit
from ..ops import limbs as lb
from ..ops import rns as rns_ops
from ..ops.modmath import mulmod
from ..ops.ntt import intt, ntt
from ..substrate import bigint


class RingEngine:
    """Per-PolyContext device kernels with plan/jit caches.

    ntt_impl selects the NTT backend: 'butterfly' (elementwise VPU stages,
    ops/ntt.py) or 'matmul' (four-step MXU digit matmuls, ops/ntt4.py).
    The two produce different (internally consistent) evaluation orders, so
    all NTT-resident objects of one engine share one backend.
    """

    def __init__(self, pctx: PolyContext, ntt_impl: str = "butterfly"):
        assert ntt_impl in ("butterfly", "matmul", "pallas")
        self.pctx = pctx
        self.ntt_impl = ntt_impl
        self._ba: dict[int, rns_ops.BasisArrays] = {}
        self._recon: dict[int, rns_ops.ReconPlan] = {}
        self._weights: dict[tuple[int, int], np.ndarray] = {}
        self._galois: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._ntt4: dict[int, object] = {}
        self._pallas: dict[int, object] = {}
        self._jit: dict = {}

    def ntt4_plan(self, dim: int):
        if dim not in self._ntt4:
            from ..ops.ntt4 import make_ntt4_plan
            self._ntt4[dim] = make_ntt4_plan(self.pctx, dim)
        return self._ntt4[dim]

    # Fold cap for the pallas kernel: one grid-free call must keep
    # input+output+zeta planes+stage temporaries inside XLA's scoped-VMEM
    # limit.  The analytic byte model underestimates Mosaic's stack (observed
    # (n=2^16, P=4, F=1): 36.41M scoped vs ~14M modeled), so the budget is the
    # empirical law calibrated on real-TPU compiles: n*P*F <= scoped_vmem/128
    # elements.  At the default 16 MiB limit that is 2^17 (known-good
    # (2^16,2,1) and (2^14,8,1); known-bad (2^16,4,1) -> 36.41M,
    # (2^14,3,8) -> 16.97M); utils/xla.py raises the limit to 64 MiB on TPU
    # per-compile, giving 2^19 (verified good: (2^16,8,1), (2^16,4,2)).
    @property
    def _pallas_fold_budget(self) -> int:
        from ..utils.xla import scoped_vmem_bytes
        return scoped_vmem_bytes() // 128

    # Single-word u32 kernel engages automatically for logp<=29 chains
    # (p < 2^30 keeps the lazy < 4p invariant inside u32 — see
    # ops/ntt_pallas32.py; ~6x fewer VPU ops per butterfly than the
    # u64-pair kernel the 59-bit reference-parity chain needs).
    @property
    def _pallas_u32(self) -> bool:
        return self.pctx.primes[self.pctx.dimub - 1] < (1 << 30)

    def pallas_plan(self, dim: int, P: int = 1, F: int = 1):
        if (dim, P, F) not in self._pallas:
            if self._pallas_u32:
                from ..ops.ntt_pallas32 import make_pallas32_plan
                self._pallas[(dim, P, F)] = make_pallas32_plan(
                    self.pctx, dim, P, F)
            else:
                from ..ops.ntt_pallas import make_pallas_plan
                self._pallas[(dim, P, F)] = make_pallas_plan(
                    self.pctx, dim, P, F)
        return self._pallas[(dim, P, F)]

    # Poly-fold cap per kernel call.  The VMEM budget alone admits P=32 at
    # logn=14, but giant folds inside LARGE fused programs put Mosaic under
    # compile-memory pressure (observed: the remote compile helper OOM-
    # SIGKILLed on a P=24 fused-stage kernel that compiles fine standalone)
    # and r4 measured the batched mul_rs running 3.4x SLOWER per ct at
    # fold 32.  Larger stacks loop over fold<=CAP kernel calls via lax.map —
    # the same cached kernels the latency path uses.
    FOLD_CAP = int(os.environ.get("GPQHE_PALLAS_FOLD_CAP", 8))

    def pallas_fold(self, P: int) -> int:
        """Largest usable poly fold for a P-poly stack (divisor of P within
        the VMEM budget and the fold cap)."""
        pmax = max(1, min(self._pallas_fold_budget // self.pctx.n,
                          self.FOLD_CAP))
        while P % pmax or pmax > P:
            pmax -= 1
        return pmax

    # Total (poly x prime) pipelines unrolled in one kernel body.  The
    # radix-4 stage fusion roughly doubled the Mosaic compile footprint per
    # pipeline: 32-pipeline UNFUSED kernels compiled fine (r3/r4), but fused
    # (P=8, F=4) and (P=24, F=1) kernels thrash or OOM-SIGKILL the remote
    # compile helper.  16 fused pipelines ~= the proven 32-unfused footprint.
    PIPE_CAP = int(os.environ.get("GPQHE_PALLAS_PIPE_CAP", 16))

    def pallas_prime_fold(self, dim: int, Pf: int) -> int:
        """Prime fold F (cuts lax.map launches to ceil(dim/F)).  Real-TPU
        timing shows F-folding loses to P-folding at equal slab count (the
        group transpose is an HBM shuffle the P axis avoids), so F only
        fills VMEM the poly axis left unused — i.e. F > 1 only for small
        poly stacks.  Tie-break: least prime padding."""
        n = self.pctx.n
        fmax = min(self._pallas_fold_budget // (n * Pf),
                   max(1, self.PIPE_CAP // Pf))
        feasible = [f for f in range(1, min(8, fmax) + 1)]
        if not feasible:
            return 1
        return min(feasible, key=lambda f: (-(dim // -f), (dim // -f) * -f - dim))

    def prepare(self, dim: int, folds: tuple[int, ...] = (1,)) -> None:
        """Eagerly materialize device plans for dim (must run OUTSIDE any jit
        trace — device arrays created during tracing would leak as tracers).
        folds lists the poly-stack sizes later NTT calls will use."""
        self.ba(dim)
        if self.ntt_impl == "matmul":
            self.ntt4_plan(dim)
        if self.ntt_impl == "pallas" and self.pctx.n >= 1024:
            for P in folds:
                Pf = self.pallas_fold(P)
                self.pallas_plan(dim, Pf, self.pallas_prime_fold(dim, Pf))

    def _pallas_ntt(self, res, dim: int, inverse: bool, scaled: bool = False):
        import jax

        if self._pallas_u32:
            from ..ops.ntt_pallas32 import ntt_pallas32 as ntt_pallas
        else:
            from ..ops.ntt_pallas import ntt_pallas
        if res.ndim == 2:
            F = self.pallas_prime_fold(dim, 1)
            return ntt_pallas(res, self.pallas_plan(dim, 1, F), inverse,
                              scaled=scaled)
        P = res.shape[0]
        if P == 1:
            # a leading length-1 stack (e.g. mul_rs_batch at B=1) must not
            # reach the plan.P == 1 kernel path with a 3-D array
            return self._pallas_ntt(res[0], dim, inverse, scaled)[None]
        fold = self.pallas_fold(P)
        F = self.pallas_prime_fold(dim, fold)
        if fold == P:
            return ntt_pallas(res, self.pallas_plan(dim, P, F), inverse,
                              scaled=scaled)
        plan = self.pallas_plan(dim, fold, F)
        if fold == 1:
            # map over bare (dim, n) slices — ntt_pallas with plan.P == 1
            # takes 2-D input (a (g, 1, dim, n) reshape would crash it)
            return jax.lax.map(
                lambda x: ntt_pallas(x, plan, inverse, scaled=scaled), res)
        g = P // fold
        out = jax.lax.map(
            lambda x: ntt_pallas(x, plan, inverse, scaled=scaled),
            res.reshape(g, fold, dim, self.pctx.n))
        return out.reshape(res.shape)

    def ntt_f(self, res, dim: int):
        """Forward NTT with the selected backend; res u64[..., dim, n].
        With the pallas backend a leading poly axis ([P, dim, n]) is folded
        into single kernel calls (same prime -> shared scalars/zetas)."""
        if self.ntt_impl == "matmul":
            from ..ops.ntt4 import ntt4
            return ntt4(res, self.ntt4_plan(dim))
        if self.ntt_impl == "pallas" and self.pctx.n >= 1024 and res.ndim <= 3:
            return self._pallas_ntt(res, dim, inverse=False)
        ba = self.ba(dim)
        return ntt(res, ba.zetas, ba.ps, ba.pinv)

    def ntt_i(self, res, dim: int, scale_phatinv: bool = False):
        """Inverse NTT with the selected backend (pallas inverse verified on
        TPU for P=1 and folded stacks; orderings match 'butterfly' exactly).

        scale_phatinv=True fuses the CRT reconstruct's per-prime phat^-1
        multiply into the INTT's final n^-1 scaling (callers then pass
        pre_scaled=True to rns.reconstruct)."""
        if self.ntt_impl == "matmul":
            from ..ops.ntt4 import intt4
            out = intt4(res, self.ntt4_plan(dim))
            if scale_phatinv:
                from ..ops.modmath import mont_mul
                ba = self.ba(dim)
                out = mont_mul(out, ba.phatinv_mont[:, None], ba.ps[:, None],
                               ba.pinv[:, None])
            return out
        if self.ntt_impl == "pallas" and self.pctx.n >= 1024 and res.ndim <= 3:
            return self._pallas_ntt(res, dim, inverse=True,
                                    scaled=scale_phatinv)
        ba = self.ba(dim)
        return intt(res, ba.zetas_inv, ba.ps, ba.pinv,
                    ba.ninvphat_mont if scale_phatinv else ba.ninv_mont)

    # -- plan caches --------------------------------------------------------

    def ba(self, dim: int) -> rns_ops.BasisArrays:
        if dim not in self._ba:
            self._ba[dim] = rns_ops.make_basis_arrays(self.pctx, dim)
        return self._ba[dim]

    def recon(self, dim: int) -> rns_ops.ReconPlan:
        if dim not in self._recon:
            self._recon[dim] = rns_ops.make_recon_plan(self.pctx, dim)
        return self._recon[dim]

    def weights(self, dim: int, k: int) -> np.ndarray:
        if (dim, k) not in self._weights:
            self._weights[(dim, k)] = rns_ops.make_decomp_weights(self.pctx, dim, k)
        return self._weights[(dim, k)]

    def galois_map(self, rot: int | None) -> tuple[np.ndarray, np.ndarray]:
        """(src_index, neg_flag) for output slot k.  rot=None means conjugation.

        poly_rot: k = i*5^rot mod 2n, sign flip above n (ref: src/poly.c:263-276);
        poly_conj: r[0]=a[0], r[i]=-a[n-i] (ref: src/poly.c:278-283)."""
        key = -1 if rot is None else rot
        if key not in self._galois:
            n, m = self.pctx.n, self.pctx.m
            src = np.empty(n, dtype=np.int32)
            negf = np.empty(n, dtype=bool)
            if rot is None:
                src[0] = 0
                negf[0] = False
                for i in range(1, n):
                    src[i] = n - i
                    negf[i] = True
            else:
                power = pow(params_rot(), rot, m)
                for i in range(n):
                    k = (i * power) % m
                    if k < n:
                        src[k] = i
                        negf[k] = False
                    else:
                        src[k - n] = i
                        negf[k - n] = True
            self._galois[key] = (src, negf)
        return self._galois[key]

    # -- jit helper ---------------------------------------------------------

    def _cached(self, key, builder):
        if key not in self._jit:
            self._jit[key] = builder()
        from ..utils import trace
        return trace.maybe_wrap(key, self._jit[key])

    # -- decompose variants -------------------------------------------------

    def _decompose_unsigned(self, a, dim: int):
        k = a.shape[-1]
        return rns_ops.decompose(a, self.ba(dim), self.weights(dim, k))

    def _decompose_signed(self, a, dim: int, src_bits: int):
        """Two's-complement input of src_bits width -> residues honouring sign."""
        ba = self.ba(dim)
        hb_limb, hb_bit = divmod(src_bits - 1, 32)
        negmask = ((a[..., hb_limb] >> jnp.uint32(hb_bit)) & jnp.uint32(1)) == 1
        mag = lb.select(negmask, lb.mask_bits(lb.neg(a), src_bits), a)
        res = self._decompose_unsigned(mag, dim)  # [dim, n]
        ps = ba.ps[:, None]
        neg_res = jnp.where(res != 0, ps - res, res)
        return jnp.where(negmask[None, :], neg_res, res)

    def decompose(self, a, dim: int, signed_bits: int | None = None):
        if signed_bits is None:
            return self._decompose_unsigned(a, dim)
        return self._decompose_signed(a, dim, signed_bits)

    # -- public jitted composites ------------------------------------------

    def fwd_ntt(self, a, dim: int, signed_bits: int | None = None):
        """limbs [n, K] -> NTT-domain residues u64[dim, n]."""
        key = ("fwd", dim, a.shape[-1], signed_bits)

        def build():
            self.prepare(dim)
            ba = self.ba(dim)

            @tpu_jit
            def f(x):
                res = self.decompose(x, dim, signed_bits)
                return self.ntt_f(res, dim)
            return f
        return self._cached(key, build)(a)

    def inv_ntt_recon(self, chat, dim: int, mask_to_bits: int, k_out: int,
                      center: bool = True):
        """NTT-domain residues -> limbs mod 2^mask_to_bits, resized to k_out."""
        key = ("invrec", dim, mask_to_bits, k_out, center)

        def build():
            self.prepare(dim)
            ba = self.ba(dim)
            plan = self.recon(dim)

            @tpu_jit
            def f(ch):
                res = self.ntt_i(ch, dim)
                c = rns_ops.reconstruct(res, ba, plan, center=center)
                return lb.fit_signed(c, mask_to_bits, k_out)
            return f
        return self._cached(key, build)(chat)

    def pointwise_mul(self, ahat, bhat, dim: int):
        key = ("pw", dim, ahat.shape)

        def build():
            ba = self.ba(dim)
            r2 = jnp.array(self.pctx.basis(dim).r2)

            @tpu_jit
            def f(x, y):
                return mulmod(x, y, ba.ps[:, None], ba.pinv[:, None], r2[:, None])
            return f
        return self._cached(key, build)(ahat, bhat)

    def poly_mul(self, a, b, dim: int, mask_to_bits: int, k_out: int,
                 signed_a: int | None = None, signed_b: int | None = None):
        """Full negacyclic product (ref: src/poly.c:84-107) with final smod as
        a power-of-two mask.  Returns u32[n, k_out]."""
        key = ("mul", dim, a.shape[-1], b.shape[-1], mask_to_bits, k_out,
               signed_a, signed_b)

        def build():
            self.prepare(dim)
            ba = self.ba(dim)
            plan = self.recon(dim)
            r2 = jnp.array(self.pctx.basis(dim).r2)

            @tpu_jit
            def f(x, y):
                xh = self.ntt_f(self.decompose(x, dim, signed_a), dim)
                yh = self.ntt_f(self.decompose(y, dim, signed_b), dim)
                ch = mulmod(xh, yh, ba.ps[:, None], ba.pinv[:, None], r2[:, None])
                res = self.ntt_i(ch, dim)
                c = rns_ops.reconstruct(res, ba, plan, center=True)
                return lb.fit_signed(c, mask_to_bits, k_out)
            return f
        return self._cached(key, build)(a, b)

    def galois(self, a, rot: int | None, q_bits: int):
        """Apply rot/conj automorphism to limbs mod 2^q_bits."""
        key = ("gal", -1 if rot is None else rot, a.shape, q_bits)

        def build():
            src, negf = self.galois_map(rot)
            srcj = jnp.asarray(src)
            negj = jnp.asarray(negf)

            @tpu_jit
            def f(x):
                g = x[srcj, :]
                neg = lb.mask_bits(lb.neg(g), q_bits)
                pos = lb.mask_bits(g, q_bits)
                return jnp.where(negj[:, None], neg, pos)
            return f
        return self._cached(key, build)(a)


def params_rot() -> int:
    from .. import params
    return params.ROT
