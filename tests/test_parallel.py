"""Multi-device tests on the virtual 8-device CPU mesh.

The sharded (limb, batch) poly_mul must agree bit-for-bit with the
single-device path (the multi-node analogue of the reference's determinism
requirement, SURVEY.md §4)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpqhe_tpu.context import PolyContext
from gpqhe_tpu.parallel.mesh import build_sharded_poly_mul, make_he_mesh
from gpqhe_tpu.ring.poly import RingEngine
from gpqhe_tpu.substrate import bigint


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_poly_mul_matches_single():
    random.seed(7)
    logn, dim, K = 6, 4, 4
    n = 1 << logn
    pctx = PolyContext(logn, q=1 << 100, dim_cap=dim)
    mesh = make_he_mesh(8, limb=4)  # (limb=4, batch=2)
    B = 4
    mask_bits = 32 * K
    f = build_sharded_poly_mul(pctx, dim, K, mask_bits, K, mesh)
    a_ints = [[random.getrandbits(100) for _ in range(n)] for _ in range(B)]
    b_ints = [[random.getrandbits(100) for _ in range(n)] for _ in range(B)]
    a = jnp.asarray(np.stack([bigint.ints_to_limbs(x, K) for x in a_ints]))
    b = jnp.asarray(np.stack([bigint.ints_to_limbs(x, K) for x in b_ints]))
    got = np.asarray(f(a, b))
    ring = RingEngine(pctx)
    for i in range(B):
        single = np.asarray(ring.poly_mul(a[i], b[i], dim, mask_bits, K))
        assert np.array_equal(got[i], single), f"batch element {i} differs"


def test_mesh_shapes():
    mesh = make_he_mesh(8)
    assert mesh.shape["limb"] * mesh.shape["batch"] == 8
