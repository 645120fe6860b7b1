#!/usr/bin/env python
"""NTT roofline: where does the Pallas NTT plateau come from, and how far
is it from the v5e speed of light?  (VERDICT r3 #2)

Separates per-call dispatch overhead from in-kernel time by timing one
program that runs ONE forward NTT pass vs one that CHAINS k passes
(fwd(fwd(...))) — the chained program pays dispatch once:

    kernel_time = (T_k - T_1) / (k - 1),   dispatch = T_1 - kernel_time

and compares kernel_time against the paper bound from the kernel's own
op-count model:

  per butterfly (ops/ntt_pallas.py, forward lazy CT):
    _cond_sub(x0)        11 u32 ops
    _shoup_mul          136 u32 ops  (24 of them 32x32 multiplies)
    2x _add64 + _sub64   15 u32 ops
    total               162 u32 VPU ops  (24 mul + 138 simple)
  per NTT at n: (n/2)*logn butterflies
  v5e VPU: 8x128 lanes x 4 ALUs x ~1.5 GHz ~= 6.1e12 u32 ops/s if every
  ALU issues every cycle (int multiplies may issue at a lower rate; the
  bound below is therefore OPTIMISTIC).

Usage:  python tools/ntt_roofline.py [logn] [dim] [P]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    CHAIN = 5
    import jax.numpy as jnp

    from gpqhe_tpu.context import PolyContext
    from gpqhe_tpu.ring.poly import RingEngine
    from gpqhe_tpu.utils.xla import tpu_jit

    n = 1 << logn
    pctx = PolyContext(logn, q=1 << 900, dim_cap=dim)
    ring = RingEngine(pctx, ntt_impl="pallas")
    ring.prepare(dim, folds=(P,))

    rng = np.random.default_rng(0)
    a = jnp.asarray(np.stack([
        np.stack([rng.integers(0, p, n, dtype=np.uint64)
                  for p in pctx.primes[:dim]])
        for _ in range(P)]))

    f1 = tpu_jit(lambda x: ring.ntt_f(x, dim))

    def chained(x):
        for _ in range(CHAIN):
            x = ring.ntt_f(x, dim)
        return x
    fk = tpu_jit(chained)

    out = f1(a)
    out.block_until_ready()
    outk = fk(a)
    outk.block_until_ready()

    def bench(f, x, iters=20):
        y = f(x)
        y.block_until_ready()
        t0 = time.time()
        for _ in range(iters):
            y = f(x)
        y.block_until_ready()
        return (time.time() - t0) / iters

    t1 = bench(f1, a)
    tk = bench(fk, a)
    ntts_per_call = P * dim
    kern = (tk - t1) / (CHAIN - 1)
    disp = t1 - kern
    per_ntt_total = t1 / ntts_per_call
    per_ntt_kern = kern / ntts_per_call

    butterflies = (n // 2) * logn
    ops = butterflies * 162
    muls = butterflies * 24
    VPU_OPS = 4096 * 1.5e9          # 8x128 lanes x 4 ALUs x 1.5 GHz
    sol_s = ops / VPU_OPS
    print(f"n=2^{logn} dim={dim} P={P}: one-pass call {t1*1e3:.2f} ms, "
          f"{CHAIN}-pass call {tk*1e3:.2f} ms")
    print(f"  per-call overhead (dispatch+layout): {disp*1e3:.2f} ms "
          f"({disp/t1*100:.0f}% of the one-pass call)")
    print(f"  in-kernel: {per_ntt_kern*1e6:.1f} us/ntt -> "
          f"{1/per_ntt_kern:.0f} ntt/s kernel-only "
          f"(vs {1/per_ntt_total:.0f} ntt/s end-to-end)")
    print(f"  paper bound: {ops/1e6:.0f}M u32 ops/ntt ({muls/1e6:.1f}M muls) "
          f"/ {VPU_OPS/1e12:.1f} Tops/s = {sol_s*1e6:.1f} us/ntt = "
          f"{1/sol_s:.0f} ntt/s speed-of-light")
    print(f"  kernel fraction of optimistic VPU peak: "
          f"{sol_s/per_ntt_kern*100:.0f}%")


if __name__ == "__main__":
    main()
