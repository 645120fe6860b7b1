#!/usr/bin/env python
"""Sweep the Pallas NTT poly-fold P at fixed n to find the throughput knee
(diagnosis for the mul_rs batch=8 regression: the batched program folds
P=4B=32 at logn=14, far beyond the P<=8 regime round 1 validated).

Usage: python tools/ntt_fold_sweep.py [logn] [dim] [P ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    Ps = [int(x) for x in sys.argv[3:]] or [1, 2, 4, 8, 16, 32]
    import jax.numpy as jnp

    from gpqhe_tpu.context import PolyContext
    from gpqhe_tpu.ring.poly import RingEngine
    from gpqhe_tpu.utils.xla import tpu_jit

    from gpqhe_tpu import params

    n = 1 << logn
    # cap q at the security-table bound (tiny rings bypass the table)
    logq = min(27 * logn, params.he_std_params(logn) or 900) if logn >= 10 \
        else 27 * logn
    pctx = PolyContext(logn, q=1 << logq, dim_cap=dim)
    ring = RingEngine(pctx, ntt_impl="pallas")
    rng = np.random.default_rng(0)

    for P in Ps:
        fold = ring.pallas_fold(P)
        F = ring.pallas_prime_fold(dim, fold)
        ring.prepare(dim, folds=(P,))
        a = jnp.asarray(np.stack([
            np.stack([rng.integers(0, p, n, dtype=np.uint64)
                      for p in pctx.primes[:dim]])
            for _ in range(P)]))
        f = tpu_jit(lambda x: ring.ntt_f(x, dim))
        out = f(a)
        out.block_until_ready()
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            out = f(out)
        out.block_until_ready()
        dt = (time.time() - t0) / iters
        print(f"P={P:3d} (kernel fold {fold}, F={F}): {dt*1e3:7.2f} ms/call "
              f"= {P*dim/dt:9.1f} ntt/s", flush=True)


if __name__ == "__main__":
    main()
