"""Acceleration-structure tests: BVH and Pallas kernels vs brute force."""
import jax.numpy as jnp
import numpy as np
import pytest


def _soup(t=600, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    e1 = rng.uniform(-0.3, 0.3, (t, 3)).astype(np.float32)
    e2 = rng.uniform(-0.3, 0.3, (t, 3)).astype(np.float32)
    return v0, e1, e2


def _rays(r=800, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _brute(v0, e1, e2, o, d):
    from rlshaders_tpu.accel.bvh import _tri_test

    ok, t, u, v = _tri_test(
        jnp.asarray(v0)[None], jnp.asarray(e1)[None], jnp.asarray(e2)[None],
        o[:, None], d[:, None], 1e-4, 1e30,
    )
    t_all = jnp.where(ok, t, 1e30)
    t_best = t_all.min(axis=1)
    tri = jnp.where(t_best < 1e30, jnp.argmin(t_all, axis=1), -1)
    return np.asarray(t_best), np.asarray(tri)


def test_bvh_matches_brute_force():
    from rlshaders_tpu.accel import bvh as B

    v0, e1, e2 = _soup()
    tree = B.build(v0, e1, e2)
    o, d = _rays()
    hit = B.intersect(tree, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), o, d)
    t_ref, tri_ref = _brute(v0, e1, e2, o, d)
    np.testing.assert_allclose(np.asarray(hit.t), t_ref, atol=1e-4, rtol=1e-4)
    assert (np.asarray(hit.tri) == tri_ref).mean() == 1.0


def test_pallas_cluster_kernel_matches_bvh():
    from rlshaders_tpu.accel import bvh as B
    from rlshaders_tpu.ops import intersect_pallas as ip

    v0, e1, e2 = _soup(900, 3)
    tree = B.build(v0, e1, e2)
    packed = ip.pack(
        v0, e1, e2, np.full(900, 255, np.int32), np.ones(900, bool),
        np.asarray(tree.tri_order),
    )
    o, d = _rays(700, 4)
    t, tri, u, v = ip.intersect(packed, o, d, vis_mask=255)
    t_ref, tri_ref = _brute(v0, e1, e2, o, d)
    np.testing.assert_allclose(np.asarray(t), t_ref, atol=1e-4, rtol=1e-4)
    assert (np.asarray(tri) == tri_ref).mean() == 1.0

    blocked = ip.occluded(packed, o, d, jnp.full((700,), 0.7), vis_mask=255)
    np.testing.assert_array_equal(np.asarray(blocked), t_ref < 0.7)


def test_axis_aligned_rays_with_negative_zero_components():
    """Regression: sign(d)*BIG+BIG == 0 for tiny negative components silently
    collapsed the slab test and lost every axis-aligned probe ray."""
    from rlshaders_tpu.accel import bvh as B

    v0 = np.array([[-1, 0, -1]], np.float32)
    e1 = np.array([[2, 0, 0]], np.float32)
    e2 = np.array([[0, 0, 2]], np.float32)
    tree = B.build(v0, e1, e2)
    o = jnp.asarray([[-0.5, 2.0, -0.5]])  # inside the triangle half (u+v<1)
    for dz in (0.0, -0.0, -2.2e-16, 2.2e-16):
        d = jnp.asarray([[-0.0, -1.0, dz]])
        hit = B.intersect(tree, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), o, d)
        assert int(hit.tri[0]) == 0, dz
        assert abs(float(hit.t[0]) - 2.0) < 1e-4


def test_visibility_mask_gating():
    from rlshaders_tpu.accel import bvh as B

    v0, e1, e2 = _soup(100, 7)
    vis = np.where(np.arange(100) % 2 == 0, 1, 2).astype(np.int32)
    tree = B.build(v0, e1, e2)
    o, d = _rays(400, 8)
    hit = B.intersect(
        tree, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), o, d,
        vis_mask=1, tri_visibility=jnp.asarray(vis),
    )
    tri = np.asarray(hit.tri)
    assert np.all(tri[tri >= 0] % 2 == 0)


def test_exclude_tri():
    from rlshaders_tpu.accel import bvh as B

    v0, e1, e2 = _soup(50, 9)
    tree = B.build(v0, e1, e2)
    o, d = _rays(300, 10)
    hit = B.intersect(tree, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), o, d)
    tri0 = np.asarray(hit.tri)
    sel = tri0 >= 0
    hit2 = B.intersect(
        tree, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), o, d,
        exclude_tri=jnp.asarray(tri0),
    )
    tri2 = np.asarray(hit2.tri)
    assert np.all(tri2[sel] != tri0[sel])


def test_native_builder_agrees_with_numpy():
    from rlshaders_tpu.accel import bvh as B, native

    if not native.available():
        pytest.skip("native builder unavailable")
    v0, e1, e2 = _soup(1200, 11)
    tree = B.build(v0, e1, e2)  # native path
    import rlshaders_tpu.accel.native as nat

    saved = (nat._lib, nat._tried)
    nat._lib, nat._tried = None, True
    try:
        tree_py = B.build(v0, e1, e2)
    finally:
        nat._lib, nat._tried = saved
    o, d = _rays(500, 12)
    h1 = B.intersect(tree, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), o, d)
    h2 = B.intersect(tree_py, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), o, d)
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), atol=1e-4)
    assert (np.asarray(h1.tri) == np.asarray(h2.tri)).mean() == 1.0
