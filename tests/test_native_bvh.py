"""Native (C++) BVH4 builder vs the numpy oracle — node-for-node."""

import numpy as np
import pytest

from izpi_tpu.accel import bvh_build, native


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_matches_python_exactly():
    rs = np.random.RandomState(3)
    n = 5000
    mn = rs.rand(n, 3) * 100
    mx = mn + rs.rand(n, 3)
    a = bvh_build.build_bvh4_from_bounds(mn, mx, seed=1, use_native=False)
    b = bvh_build.build_bvh4_from_bounds(mn, mx, seed=1, use_native=True)
    np.testing.assert_array_equal(a.prim_order, b.prim_order)
    np.testing.assert_array_equal(a.child, b.child)
    np.testing.assert_array_equal(a.count, b.count)
    np.testing.assert_array_equal(a.bounds, b.bounds)
    assert bvh_build.validate(b, n) == []


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_large_build_valid():
    rs = np.random.RandomState(4)
    n = 200_000
    mn = rs.rand(n, 3) * 1000
    mx = mn + rs.rand(n, 3)
    arrays = bvh_build.build_bvh4_from_bounds(mn, mx, seed=2)
    assert bvh_build.validate(arrays, n) == []
    assert (arrays.count <= bvh_build.LEAF_SIZE).all()


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_sah_builders_match_and_validate():
    """Binned-SAH build: native C++ vs numpy node-for-node, plus structural
    validation (the kernel's quality tree, bvh_build._build_binary_sah).
    The native side calls native.build directly — build_bvh4_from_bounds
    silently falls back to numpy when the toolchain is missing, which would
    make this comparison vacuous."""
    rs = np.random.RandomState(7)
    n = 5000
    lo = rs.rand(n, 3) * 50
    hi = lo + rs.rand(n, 3)
    raw = native.build(lo, hi, seed=1, leaf_size=16, method="sah")
    assert raw is not None
    a = bvh_build.BVH4Arrays(*raw)
    b = bvh_build.build_bvh4_from_bounds(lo, hi, 1, use_native=False,
                                         leaf_size=16, method="sah")
    assert np.array_equal(a.child, b.child)
    assert np.array_equal(a.count, b.count)
    assert np.array_equal(a.prim_order, b.prim_order)
    assert np.allclose(a.bounds, b.bounds)
    assert bvh_build.validate(a, n, stack_depth=64) == []
