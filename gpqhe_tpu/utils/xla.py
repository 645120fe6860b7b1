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


def tpu_jit(fun=None, **kw):
    """Drop-in jax.jit that raises the TPU scoped-VMEM limit per-compile.

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
        if _core.trace_state_clean():
            return _outer()(*a, **k)
        return plain(*a, **k)

    wrapper.lower = lambda *a, **k: _outer().lower(*a, **k)
    wrapper.__wrapped__ = fun
    return wrapper
