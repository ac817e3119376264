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


def test_trace_sets_subset_accel(tmp_path):
    """Trace sets (Arnold AiShaderGlobalsSetTraceSet, rlSss.h:213-218):
    meshes declare `trace_sets` names; build_trace_set returns an accel
    restricted to members (inclusive) or non-members (exclusive), with
    ORIGINAL triangle ids, so probe/secondary queries can be confined the
    way the reference's probe tracer was designed to be."""
    import os

    import jax.numpy as jnp

    from rlshaders_tpu.accel import trace as tracemod
    from rlshaders_tpu.scene import build as buildmod

    scene_text = """
options
{ AA_samples 1 xres 4 yres 4 camera "cam" }
persp_camera
{ name cam
 fov 40
 matrix
 1 0 0 0
 0 0 -1 0
 0 1 0 0
 0 3 0 1
}
polymesh
{
 name upper
 nsides 4
 vidxs 4 1 UINT
0 1 3 2
 vlist 4 1 POINT
-5 0 5 5 0 5 -5 0 -5 5 0 -5
 nlist 4 1 VECTOR
0 1 0 0 1 0 0 1 0 0 1 0
 nidxs 4 1 UINT
0 1 2 3
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 1 0 1
 shader "sg"
 declare trace_sets constant ARRAY STRING
 trace_sets "setA"
}
polymesh
{
 name lower
 nsides 4
 vidxs 4 1 UINT
0 1 3 2
 vlist 4 1 POINT
-5 0 5 5 0 5 -5 0 -5 5 0 -5
 nlist 4 1 VECTOR
0 1 0 0 1 0 0 1 0 0 1 0
 nidxs 4 1 UINT
0 1 2 3
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 -1 0 1
 shader "sg"
}
MayaShadingEngine
{ name sg beauty mat }
standard
{ name mat Kd 1 }
"""
    p = os.path.join(str(tmp_path), "ts.ass")
    with open(p, "w") as f:
        f.write(scene_text)
    scene = buildmod.build(p)
    assert scene.trace_set_names == ["setA"]
    g = scene.geometry
    mesh_of = np.asarray(g.mesh_id)

    o = jnp.asarray([[0.0, 5.0, 0.0]] * 4, jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]] * 4, jnp.float32)

    full = tracemod.build(g)
    h = tracemod.nearest(full, g, o, d, vis_mask=0xFF)
    assert np.all(mesh_of[np.asarray(h.tri)] == 0)  # upper plane first

    inc = tracemod.build_trace_set(g, 0, inclusive=True)
    h_inc = tracemod.nearest(inc, g, o, d, vis_mask=0xFF)
    assert np.all(mesh_of[np.asarray(h_inc.tri)] == 0)

    exc = tracemod.build_trace_set(g, 0, inclusive=False)
    h_exc = tracemod.nearest(exc, g, o, d, vis_mask=0xFF)
    tri_exc = np.asarray(h_exc.tri)
    assert np.all(tri_exc >= 0)
    assert np.all(mesh_of[tri_exc] == 1)  # set member skipped -> lower plane

    # occlusion honors the subset too: a segment ending between the planes
    # is blocked by the upper plane only for the inclusive accel
    tmax = jnp.full((4,), 5.5, jnp.float32)
    assert bool(np.all(np.asarray(
        tracemod.occluded(inc, g, o, d, tmax, vis_mask=0xFF))))
    assert not bool(np.any(np.asarray(
        tracemod.occluded(exc, g, o, d, tmax, vis_mask=0xFF))))
