#!/usr/bin/env python
"""Analytic ICI scaling model for the sharded mul_rs (BASELINE.md north-star
row 3: ">= 70% scaling efficiency").

Real multi-chip hardware is not available in this environment (one v5e chip
behind a tunnel), so this computes the EXACT per-device communication volume
of the sharded (limb, coeff, batch) mul_rs program from the context's basis
sizes, and projects scaling efficiency against the measured single-chip
compute latency:

    eff(N) = t_compute/N / (t_compute/N + t_comm(N))

Communication per mul_rs on a (limb=L, coeff=S, batch=B) mesh, per device
(see parallel/mesh.py build_sharded_mul_rs):

  - ppermute block swaps inside each coeff-sharded NTT: the first log2(S)
    stages each exchange HALF the local slab of every (limb, poly) stack:
    10 NTT stacks total (4 fwd + 3 inv at dim_mul; 1 fwd + 2 inv at
    dim_swk), bytes = log2(S) * (dim_local * n/S * 8) / 2 per stack.
  - limb-axis psums of the CRT digit columns (i32[n_local, kd8]): 2 at
    dim_mul (d0/d1... d2 rides the key-switch basis), 2 at dim_swk
    (key-switch pair), 1 sub-basis remainder psum; ring all-reduce moves
    ~2*(L-1)/L of the column block per device.

Bandwidth default: 4 ICI links/chip x 45 GB/s usable each (v5e, "How to
Scale Your Model" fig.; override with --bw GB/s).

Usage: python tools/scaling_model.py [logn] [logq] [t_compute_ms] [--bw N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    logn = int(args[0]) if len(args) > 0 else 14
    logq = int(args[1]) if len(args) > 1 else 438
    t_ms = float(args[2]) if len(args) > 2 else 8.14   # BENCH_r04 single chip
    bw = 4 * 45e9
    for a in sys.argv[1:]:
        if a.startswith("--bw"):
            bw = float(a.split("=")[1]) * 1e9

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    if os.environ["JAX_PLATFORMS"] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from gpqhe_tpu.context import HeContext

    ctx = HeContext(logn=logn, q=1 << logq, slots=4, Delta=1 << 30)
    n = ctx.poly.n
    l = ctx.L
    dim_m = ctx.dim_mul(l)
    dim_s = ctx.dim_swk(l)
    klv = (ctx.q[l].bit_length() + 31) // 32
    kd8 = 4 * klv            # reconstruct digit columns (ops/rns.py fast path)

    print(f"logn={logn} logq={logq}: dim_mul={dim_m} dim_swk={dim_s} "
          f"kd8={kd8}  t_compute={t_ms} ms (measured, 1 chip)")
    print(f"ICI bandwidth model: {bw/1e9:.0f} GB/s per device")
    print(f"{'N':>3} {'mesh(L,S,B)':>12} {'comm MB/dev':>12} "
          f"{'t_comm ms':>10} {'t/N ms':>8} {'eff %':>6}")
    import math
    for N, (L, S, B) in [(1, (1, 1, 1)), (2, (2, 1, 1)), (4, (2, 2, 1)),
                         (8, (2, 2, 2)), (16, (4, 2, 2)), (32, (4, 4, 2))]:
        # ppermute volume per device: 10 stacks, half-slab per cross stage
        dim_stack = 4 * dim_m + 3 * dim_m + dim_s + 2 * dim_s
        pp = math.log2(S) * (dim_stack / L) * (n / S) * 8 / 2 if S > 1 else 0
        # psum ring volume per device: 5 column blocks
        ps = 5 * 2 * (L - 1) / L * (n / S) * kd8 * 4 if L > 1 else 0
        comm = pp + ps        # per device (batch shards are independent)
        t_comm = comm / bw * 1e3
        t_n = t_ms / N
        eff = t_n / (t_n + t_comm) * 100
        print(f"{N:>3} {str((L,S,B)):>12} {comm/1e6:>12.2f} "
              f"{t_comm:>10.3f} {t_n:>8.2f} {eff:>6.1f}")


if __name__ == "__main__":
    main()
