#!/usr/bin/env python
"""Benchmark: the north-star metrics from BASELINE.md on one chip.

  1. negacyclic NTT throughput at N = 2^16 (one "op" = one forward
     length-65536 NTT over one 59-bit prime);
  2. fused ciphertext mult+relinearize+rescale latency at the reference's
     linear-op parameters (logn=14, logq=438 — ref: tests/gpqhe.c:1296-1299),
     with a decode-correctness check against the plaintext product;
  3. the same op's amortized per-ciphertext THROUGHPUT at batch=8 (one
     program, NTT poly-fold axis = 4B — CKKS.mul_rs_batch);
  4. double-hoisted BSGS gemv latency at the same parameters (slots=16);
  5. full bootstrap latency (default: logn=9 proxy with the REAL reference
     depth h=64/iter=9; reference scale logn=15/logq=881 with
     BENCH_FULL_BOOTSTRAP=1 — ref: src/he-bootstrap.c:477-546).

Robustness (the round-4 lesson: one wedged tunnel compile nulled the whole
artifact): this file is BOTH the orchestrator and every stage.

  python bench.py                 # orchestrator: stages as subprocesses
  python bench.py --stage scheme  # one stage, prints its JSON metric lines

The orchestrator gives each stage its own wall-clock budget, forwards metric
lines the moment a stage emits them, survives any stage's failure or hang
(SIGTERM after budget; SIGKILL only 15 s later as a last resort), enforces a
global deadline (BENCH_DEADLINE_S, default 1500 s), and always exits 0.
Stages are ordered most-metrics-soonest.  Every stage enables the persistent
compilation cache (utils/xla.py enable_persistent_cache) — verified to replay
remote-tunnel TPU compiles from disk in seconds, so a rerun after a partial
failure never repays cold compiles.

The reference publishes no numbers, so vs_baseline for (1) is the speedup
over a vectorized numpy CPU implementation of the identical kernel on this
host, for (2) the round-1 starting latency (36.2 ms) over the current one,
for (3) the per-ct speedup over this run's single-ct latency, for (4) the
round-1 classic-path latency at logn=12 (41.0 ms), and for (5) 1.0.

Prints one JSON line per metric:
  {"metric": "ntt_n65536_ops_per_sec", "value": N, "unit": "ntt/s", ...}
  {"metric": "mul_rs_ms", ...}  {"metric": "mul_rs_batch8_ms_per_ct", ...}
  {"metric": "gemv_ms", ...}    {"metric": "bootstrap_logn9_s", ...}
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(metric, value, unit, vs_baseline):
    print(json.dumps({"metric": metric, "value": value, "unit": unit,
                      "vs_baseline": vs_baseline}), flush=True)


def have(metric: str) -> bool:
    """True when a prior attempt of this stage already delivered `metric`
    (BENCH_HAVE, set by the orchestrator) — the retry skips its
    measurement loop and spends the budget on what is missing."""
    return metric in os.environ.get("BENCH_HAVE", "").split(",")


# ===========================================================================
# orchestrator
# ===========================================================================

STAGES = (
    # (name, budget_seconds, expected_metric_lines).  Budgets cover COLD
    # compiles over the tunnel; with the persistent cache warm each stage
    # runs in seconds.  A stage delivering fewer lines than expected gets
    # one retry (cheap: already-compiled programs replay from the cache).
    ("probe", 300, 1),
    ("scheme", 900, 3),
    ("ntt", 600, 1),
    ("bootstrap", 900, 1),
)


_EMITTED: set = set()   # metric names already forwarded (dedup across retries)


def run_stage(name: str, budget: float) -> int:
    """Run one stage as a subprocess, forwarding its stdout lines live
    (deduped by metric name across retries).  Returns the cumulative number
    of this stage's metrics forwarded."""
    import subprocess
    import threading

    cmd = [sys.executable, os.path.abspath(__file__), "--stage", name]
    log(f"[bench] stage {name}: budget {budget:.0f}s")
    t0 = time.time()
    env = dict(os.environ)
    env["BENCH_HAVE"] = ",".join(sorted(_EMITTED))   # retries skip these
    p = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=None,
                         cwd=HERE, text=True, bufsize=1, env=env)
    n_metrics = 0

    def reader():
        nonlocal n_metrics
        for line in p.stdout:
            line = line.rstrip("\n")
            if not line:
                continue
            try:
                mname = json.loads(line).get("metric")
            except Exception:
                mname = None
            if mname is not None and mname in _EMITTED:
                n_metrics += 1
                continue
            if mname is not None:
                _EMITTED.add(mname)
            print(line, flush=True)
            n_metrics += 1

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    try:
        p.wait(timeout=budget)
    except subprocess.TimeoutExpired:
        log(f"[bench] stage {name}: BUDGET EXCEEDED ({budget:.0f}s) — SIGTERM")
        p.terminate()
        try:
            p.wait(timeout=15)
        except subprocess.TimeoutExpired:
            log(f"[bench] stage {name}: SIGKILL (last resort)")
            p.kill()
            p.wait()
    th.join(timeout=5)
    rc = p.returncode
    log(f"[bench] stage {name}: rc={rc}, {n_metrics} metric(s), "
        f"{time.time()-t0:.1f}s")
    return n_metrics


def orchestrate() -> None:
    deadline = float(os.environ.get("BENCH_DEADLINE_S", 1500))
    t0 = time.time()
    for name, budget, expect in STAGES:
        if name == "bootstrap" and os.environ.get("BENCH_SKIP_BOOTSTRAP") == "1":
            log("[bench] bootstrap: skipped (BENCH_SKIP_BOOTSTRAP=1)")
            continue
        if name == "bootstrap" and os.environ.get("BENCH_FULL_BOOTSTRAP") == "1":
            budget = max(budget, deadline - (time.time() - t0) - 30)
        for attempt in range(2):
            remaining = deadline - (time.time() - t0)
            if remaining < 90:
                log(f"[bench] global deadline reached — skipping {name}")
                break
            try:
                n = run_stage(name, min(budget, remaining - 30))
            except Exception as e:  # orchestrator must never die
                log(f"[bench] stage {name}: orchestrator error "
                    f"{type(e).__name__}: {e}")
                n = 0
            if n >= expect:
                break
            if attempt == 0:
                # tunnel flake or wedge: grace for relay recovery, then one
                # retry — already-compiled programs replay from the cache
                log(f"[bench] stage {name}: {n}/{expect} metrics — "
                    f"30s grace, then one retry")
                time.sleep(30)
    log(f"[bench] done in {time.time()-t0:.1f}s")


# ===========================================================================
# stage plumbing
# ===========================================================================

def stage_setup():
    """Common per-stage init: x64, persistent compile cache, repo path."""
    t0 = time.time()
    sys.path.insert(0, HERE)
    import jax
    jax.config.update("jax_enable_x64", True)
    from gpqhe_tpu.utils.xla import enable_persistent_cache
    cache_dir = enable_persistent_cache()
    dev = jax.devices()[0]
    log(f"device: {dev} ({time.time()-t0:.1f}s startup; cache {cache_dir})")
    return t0


def numpy_ntt_baseline(a, zetas, p, pinv):
    """Same butterfly network, vectorized numpy u64 on host CPU."""
    import numpy as np
    M32 = np.uint64(0xFFFFFFFF)
    S32 = np.uint64(32)

    def mont_mul(x, y):
        xl = x & M32
        xh = x >> S32
        yl = y & M32
        yh = y >> S32
        ll = xl * yl
        lh = xl * yh
        hl = xh * yl
        cross = (ll >> S32) + (lh & M32) + (hl & M32)
        hi = xh * yh + (lh >> S32) + (hl >> S32) + (cross >> S32)
        lo = (cross << S32) | (ll & M32)
        u = lo * pinv
        ul = u & M32
        uh = u >> S32
        pl_ = p & M32
        ph = p >> S32
        ll2 = ul * pl_
        lh2 = ul * ph
        hl2 = uh * pl_
        cross2 = (ll2 >> S32) + (lh2 & M32) + (hl2 & M32)
        t = uh * ph + (lh2 >> S32) + (hl2 >> S32) + (cross2 >> S32)
        r = hi - t
        return np.where(hi < t, r + p, r)

    n = a.shape[-1]
    length = n // 2
    while length >= 1:
        nblocks = n // (2 * length)
        x = a.reshape(a.shape[:-1] + (nblocks, 2, length))
        z = zetas[nblocks:2 * nblocks].reshape(nblocks, 1)
        x0 = x[..., 0, :]
        x1 = x[..., 1, :]
        t = mont_mul(x1, z)
        s = x0 + t
        y0 = np.where(s >= p, s - p, s)
        d = x0 - t
        y1 = np.where(x0 < t, d + p, d)
        a = np.stack([y0, y1], axis=-2).reshape(a.shape[:-2] + (a.shape[-2], n))
        length //= 2
    return a


# ===========================================================================
# stages
# ===========================================================================

def stage_probe():
    """Tunnel + Mosaic-helper + cache health check: one trivial XLA program
    and one tiny pallas NTT (logn=10).  Emits a heartbeat metric so the
    orchestrator can tell success from a hang."""
    t0 = stage_setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    f = jax.jit(lambda x: (x @ x).sum())
    r = f(jnp.ones((256, 256), jnp.float32))
    r.block_until_ready()
    log(f"probe: XLA ok ({time.time()-t0:.1f}s)")

    from gpqhe_tpu.context import PolyContext
    from gpqhe_tpu.ring.poly import RingEngine
    from gpqhe_tpu.utils.xla import tpu_jit
    pctx = PolyContext(10, q=1 << 27)
    ring = RingEngine(pctx, ntt_impl="pallas")
    DIM = 2
    ring.prepare(DIM)
    rng = np.random.default_rng(0)
    a = jnp.asarray(np.stack([rng.integers(0, p, 1024, dtype=np.uint64)
                              for p in pctx.primes[:DIM]]))
    fwd = tpu_jit(lambda x: ring.ntt_f(x, DIM))
    out = fwd(a)
    out.block_until_ready()
    check = numpy_ntt_baseline(np.asarray(a)[0:1].copy(), pctx.prime_ctx[0].zetas,
                               np.uint64(pctx.primes[0]),
                               np.uint64(pctx.prime_ctx[0].pinv_mont))
    assert np.array_equal(np.asarray(out)[0], check[0]), "probe NTT mismatch"
    dt = time.time() - t0
    log(f"probe: pallas ok ({dt:.1f}s)")
    emit("probe_s", round(dt, 2), "s", 1.0)


def stage_ntt():
    """Metric 1: NTT throughput at n=2^16 over a [BATCH, DIM] fold."""
    t0 = stage_setup()
    import jax.numpy as jnp
    import numpy as np
    from gpqhe_tpu.context import PolyContext
    from gpqhe_tpu.ops import rns as rns_ops
    from gpqhe_tpu.ring.poly import RingEngine
    from gpqhe_tpu.utils.xla import tpu_jit

    # BATCH=8 polys fold into one kernel call per prime under the raised
    # 64 MiB scoped-VMEM limit (utils/xla.py) — verified on v5e.
    LOGN, DIM, BATCH = 16, 16, 8
    n = 1 << LOGN
    pctx = PolyContext(LOGN, q=1 << 900, dim_cap=DIM)
    rns_ops.make_basis_arrays(pctx, DIM)
    # pallas backend: fused all-stage VMEM kernels with the poly fold
    # (bit-identical evaluation order to the butterfly path, which in turn
    # is checked against the numpy oracle below)
    ring = RingEngine(pctx, ntt_impl="pallas")
    ring.prepare(DIM, folds=(BATCH,))
    log(f"context ready ({time.time()-t0:.1f}s)")

    rng = np.random.default_rng(0)
    a_np = np.stack([
        np.stack([rng.integers(0, p, n, dtype=np.uint64) for p in pctx.primes[:DIM]])
        for _ in range(BATCH)])
    a = jnp.asarray(a_np)

    fwd = tpu_jit(lambda x: ring.ntt_f(x, DIM))
    lowered = fwd.lower(a)
    log(f"lowered ({time.time()-t0:.1f}s)")
    comp = lowered.compile()
    log(f"compiled ({time.time()-t0:.1f}s)")
    out = comp(a)
    out.block_until_ready()

    # correctness spot check vs numpy baseline on one (batch, prime)
    check = numpy_ntt_baseline(a_np[0, 0:1].copy(), pctx.prime_ctx[0].zetas,
                               np.uint64(pctx.primes[0]),
                               np.uint64(pctx.prime_ctx[0].pinv_mont))
    assert np.array_equal(np.asarray(out)[0, 0], check[0]), "TPU NTT mismatch vs host"
    log("correctness check passed")

    iters = 20
    best = float("inf")
    for _ in range(3):   # min-of-rounds: tunnel RPC latency is bursty
        t1 = time.time()
        for _ in range(iters):
            out = comp(out)
        out.block_until_ready()
        best = min(best, time.time() - t1)
    ops_per_sec = BATCH * DIM * iters / best
    log(f"device: {iters} iters of [{BATCH},{DIM},{n}] in {best:.3f}s -> "
        f"{ops_per_sec:.1f} ntt/s (min of 3 rounds)")

    # CPU baseline: one prime's stack, normalized to ops/s
    b_np = a_np[0, :4].copy()
    t1 = time.time()
    numpy_ntt_baseline(b_np, pctx.prime_ctx[0].zetas,
                       np.uint64(pctx.primes[0]),
                       np.uint64(pctx.prime_ctx[0].pinv_mont))
    base_ops = 4 / (time.time() - t1)
    log(f"numpy-cpu baseline: {base_ops:.1f} ntt/s")
    emit("ntt_n65536_ops_per_sec", round(ops_per_sec, 2), "ntt/s",
         round(ops_per_sec / base_ops, 3))


def stage_scheme():
    """Metrics 2-4: mul_rs latency, batch-8 throughput, hoisted gemv —
    one context (logn=14, logq=438), one key set."""
    t0 = stage_setup()
    import jax
    import numpy as np
    from gpqhe_tpu.context import HeContext
    from gpqhe_tpu.ring import sample as smp
    from gpqhe_tpu.scheme.engine import CKKS
    from gpqhe_tpu.substrate.surf import Surf

    ctx = HeContext(logn=14, q=1 << 438, slots=16, Delta=1 << 50)
    eng = CKKS(ctx, rng=Surf(), ntt_impl="pallas")
    pk, sk = eng.keypair()
    rlk = eng.genrlk(sk)
    m1 = smp.sample_z01vec(eng.rng, ctx.slots)
    m2 = smp.sample_z01vec(eng.rng, ctx.slots)
    ct1 = eng.enc_pk(eng.ecd(m1), pk)
    ct2 = eng.enc_pk(eng.ecd(m2), pk)
    log(f"mul_rs context+keys ready ({time.time()-t0:.1f}s)")

    out_ct = eng.mul_rs(ct1, ct2, rlk)      # compile + warm
    got = eng.dcd(eng.dec(out_ct, sk))
    diff = float(np.max(np.abs(got - m1 * m2)))
    assert diff < 1e-5, f"mul_rs decode diff {diff} exceeds the reference KAT tolerance"
    log(f"mul_rs correctness check passed (diff {diff:.2e}; "
        f"{time.time()-t0:.1f}s)")
    ms = None

    # min over measurement rounds: the tunnel relay adds bursty RPC latency
    # (observed 2x swings between whole runs); min-of-rounds is the standard
    # stable latency estimator under external noise
    def min_rounds(fn, iters, rounds=3):
        best = float("inf")
        for _ in range(rounds):
            t1 = time.time()
            for _ in range(iters):
                out = fn()
            jax.block_until_ready(out)
            best = min(best, (time.time() - t1) / iters)
        return best * 1e3

    if not have("mul_rs_ms"):
        out = eng.mul_rs(ct1, ct2, rlk)
        jax.block_until_ready((out.c0, out.c1))
        ms = min_rounds(lambda: eng.mul_rs(ct1, ct2, rlk).c0, 10)
        log(f"mul_rs: {ms:.2f} ms (logn=14, logq=438)")
        # round-1 starting latency as baseline
        emit("mul_rs_ms", round(ms, 2), "ms", round(36.2 / ms, 3))

    # ---- throughput: amortized ms/ct at batch=8 (one fused program)
    if not have("mul_rs_batch8_ms_per_ct"):
        try:
            Bb = 8
            cts1 = [ct1] * Bb
            cts2 = [ct2] * Bb
            outs = eng.mul_rs_batch(cts1, cts2, rlk)      # compile + warm
            jax.block_until_ready([(o.c0, o.c1) for o in outs])
            gotb = eng.dcd(eng.dec(outs[0], sk))
            diffb = float(np.max(np.abs(gotb - m1 * m2)))
            assert diffb < 1e-5, f"batched mul_rs decode diff {diffb}"
            ms_ct = min_rounds(
                lambda: eng.mul_rs_batch(cts1, cts2, rlk)[-1].c0, 5) / Bb
            log(f"mul_rs batch={Bb}: {ms_ct:.2f} ms/ct amortized "
                f"({time.time()-t0:.1f}s)")
            emit("mul_rs_batch8_ms_per_ct", round(ms_ct, 2), "ms/ct",
                 round((ms or 9.2) / ms_ct, 3))   # vs single-ct latency
        except Exception as e:
            log(f"batch stage FAILED: {type(e).__name__}: {e}")

    # ---- algorithm layer: hoisted gemv at slots=16
    if have("gemv_ms"):
        return
    try:
        from gpqhe_tpu.algo.linalg import HoistedGemvPlan, gemv
        rk = eng.genrk(sk)
        rng_np = np.random.default_rng(1)
        A = (rng_np.standard_normal(ctx.slots * ctx.slots)
             + 1j * rng_np.standard_normal(ctx.slots * ctx.slots))
        plan = HoistedGemvPlan(eng, A)
        out = gemv(eng, None, ct1, rk, plan=plan, hoisted=True)   # compile + warm
        jax.block_until_ready((out.c0, out.c1))
        got = eng.dcd(eng.dec(out, sk))
        want = A.reshape(ctx.slots, ctx.slots) @ m1
        diffg = float(np.max(np.abs(got - want)))
        assert diffg < 1e-5, f"gemv decode diff {diffg}"
        assert plan.fallbacks == 0, "hoisted gemv fell back to the classic path"
        ms_g = min_rounds(
            lambda: gemv(eng, None, ct1, rk, plan=plan, hoisted=True).c0, 5)
        log(f"gemv (hoisted, slots=16, logn=14): {ms_g:.2f} ms "
            f"({time.time()-t0:.1f}s)")
        emit("gemv_ms", round(ms_g, 2), "ms", round(41.0 / ms_g, 3))
    except Exception as e:
        log(f"gemv stage FAILED: {type(e).__name__}: {e}")


def stage_bootstrap():
    """Metric 5: full bootstrap pipeline on the chip: raise -> SubSum ->
    c2s -> EvalSin -> s2c, the deepest composition (dozens of per-level
    programs).

    Default config: logn=9, logq=640 — the REAL pipeline at the reference's
    Hamming weight h=64 and EvalSin depth iter=9 (the range condition
    2^iter >= 4*pi*(h/2+1) is h-determined, so the arithmetic depth is
    IDENTICAL to the reference scale; only the ring is small).  The
    reference-scale config (logn=15, logq=881 — tests/test_bootstrap_refscale
    and README) is opt-in via BENCH_FULL_BOOTSTRAP=1 (cold compiles are
    multi-hour over the tunnel; warm from the persistent cache it is
    driver-affordable).

    Message scaled by 0.1, decode gate 1e-2 (see doc/architecture.md's
    bootstrap error budget: EvalSin's approximation error in message units
    is ~q_src/(2pi*Delta) * eps_taylor, far above the 1e-5 linear-op gate)."""
    t0 = stage_setup()
    import jax
    import numpy as np
    from gpqhe_tpu import bootstrap as bs
    from gpqhe_tpu.context import HeContext
    from gpqhe_tpu.ring import sample as smp
    from gpqhe_tpu.scheme.engine import CKKS
    from gpqhe_tpu.substrate.surf import Surf

    full = os.environ.get("BENCH_FULL_BOOTSTRAP") == "1"
    if full:
        logn, logq, min_l = 15, 881, 10
    else:
        logn, logq, min_l = 9, 640, 2
    ctx = HeContext(logn=logn, q=1 << logq, slots=4, Delta=1 << 30)
    eng = CKKS(ctx, rng=Surf(), ntt_impl="pallas" if logn >= 10 else "butterfly")
    pk, sk = eng.keypair()
    rlk = eng.genrlk(sk)
    ck = eng.genck(sk)
    rk = eng.genrk(sk, bs.bootstrap_rotations(ctx))
    log(f"bootstrap(logn={logn}, logq={logq}, h=64, iter=9): keys ready "
        f"({time.time()-t0:.1f}s)")
    m0 = 0.1 * smp.sample_z01vec(eng.rng, ctx.slots)
    ct = eng.enc_pk(eng.ecd(m0), pk)
    # consume levels down to l=1 so the raise has work to do
    while ct.l > 1:
        ct = eng.moddown(ct)
    bctx = bs.BootstrapContext(eng)
    t1 = time.time()
    out = bs.bootstrap(eng, bctx, ct, rlk, ck, rk, iter=9)
    jax.block_until_ready((out.c0, out.c1))
    cold_s = time.time() - t1
    got = eng.dcd(eng.dec(out, sk))
    diff = float(np.max(np.abs(got - m0)))
    log(f"bootstrap cold (compiles included): {cold_s:.1f}s, diff {diff:.2e}")
    assert diff < 1e-2, f"bootstrap decode diff {diff} exceeds 1e-2"
    assert out.l >= min_l, f"bootstrap landed too low (l={out.l})"
    t1 = time.time()
    out = bs.bootstrap(eng, bctx, ct, rlk, ck, rk, iter=9)
    jax.block_until_ready((out.c0, out.c1))
    warm_s = time.time() - t1
    log(f"bootstrap warm: {warm_s:.2f}s (levels left: {out.l})")
    emit("bootstrap_s" if full else "bootstrap_logn9_s", round(warm_s, 2),
         "s", 1.0)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        {"probe": stage_probe, "ntt": stage_ntt, "scheme": stage_scheme,
         "bootstrap": stage_bootstrap}[sys.argv[2]]()
        return
    orchestrate()


if __name__ == "__main__":
    main()
