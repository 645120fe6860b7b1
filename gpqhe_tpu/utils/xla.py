"""Central jax.jit wrapper injecting TPU compile options.

The TPU compile path enforces XLA's default 16 MiB scoped-VMEM limit, which
the fused all-stage pallas NTT kernels exceed at large (n, fold) products
(observed: n=2^16 P=4 F=1 needs 36.4 MiB).  `xla_tpu_scoped_vmem_limit_kib`
is a per-compile DebugOptions field that jax forwards via
``jit(compiler_options=...)`` — verified to reach the remote compile helper
over the axon tunnel, unlike XLA_FLAGS (the local CPU jaxlib aborts on
TPU-only flags at startup).  v5e has 128 MiB VMEM per core; 64 MiB scoped
leaves headroom for XLA's own double-buffering.

CPU backends reject TPU options, so injection is gated on the default
backend.  Override the limit with GPQHE_SCOPED_VMEM_KIB (0 disables).
"""

import os

import jax

SCOPED_VMEM_KIB = int(os.environ.get("GPQHE_SCOPED_VMEM_KIB", 64 * 1024))

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 0.5) -> str:
    """Turn on JAX's persistent compilation cache (verified working over the
    axon TPU tunnel, including pallas/Mosaic kernels and per-compile
    compiler_options: a 67 s cold pallas-NTT compile replays in <2 s from a
    fresh process).  Call BEFORE the first jit dispatch.  Safe to share one
    directory across backends (the backend is part of the cache key)."""
    cache_dir = cache_dir or os.environ.get("GPQHE_CACHE_DIR", DEFAULT_CACHE_DIR)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return cache_dir

_TPU_BACKENDS = ("tpu", "axon")


def tpu_compiler_options() -> dict | None:
    """The compiler_options dict for the current default backend, or None."""
    if SCOPED_VMEM_KIB and jax.default_backend() in _TPU_BACKENDS:
        return {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_KIB}
    return None


def scoped_vmem_bytes() -> int:
    """The scoped-VMEM budget pallas fold planning may assume, in bytes."""
    if jax.default_backend() in _TPU_BACKENDS and SCOPED_VMEM_KIB:
        return SCOPED_VMEM_KIB << 10
    return 16 << 20


_TRANSIENT_MARKERS = ("remote_compile", "read body", "connection reset",
                      "Connection refused", "EOF", "Deadline Exceeded")


def _is_transient(e: Exception) -> bool:
    """Tunnel-flake heuristic: the axon remote-compile helper occasionally
    drops an HTTP response mid-stream (observed: 'INTERNAL: http://…/
    remote_compile: read body: response body closed before all bytes were
    read').  Such failures are retryable — the persistent compilation cache
    replays already-compiled programs, so a retry only repays the one
    interrupted compile."""
    msg = str(e)
    return any(m in msg for m in _TRANSIENT_MARKERS)


def tpu_jit(fun=None, **kw):
    """Drop-in jax.jit that raises the TPU scoped-VMEM limit per-compile and
    retries transient remote-compile-helper failures.

    ``compiler_options`` is only legal on a TOP-LEVEL jit (nested jits are
    inlined into the outer program and compile with ITS options), but the
    engine composes jitted op builders inside other jitted programs freely —
    so dispatch on the trace state per call: outside any trace use the
    options-carrying jit, inside a trace fall back to a plain jit."""
    if fun is None:
        return lambda f: tpu_jit(f, **kw)
    from jax._src import core as _core
    plain = jax.jit(fun, **kw)
    cache: dict[str, object] = {}

    def _outer():
        if "jit" not in cache:
            opts = tpu_compiler_options()
            cache["jit"] = (jax.jit(fun, compiler_options=opts, **kw)
                            if opts else plain)
        return cache["jit"]

    def wrapper(*a, **k):
        if not _core.trace_state_clean():
            return plain(*a, **k)
        for attempt in range(3):
            try:
                return _outer()(*a, **k)
            except jax.errors.JaxRuntimeError as e:
                if attempt == 2 or not _is_transient(e):
                    raise
                import sys
                import time
                time.sleep(5 * (attempt + 1))
                print(f"tpu_jit: retrying after transient backend error "
                      f"({type(e).__name__})", file=sys.stderr, flush=True)

    wrapper.lower = lambda *a, **k: _outer().lower(*a, **k)
    wrapper.__wrapped__ = fun
    return wrapper
