"""Scene parsing + EXR codec tests against the real reference artifacts."""
import os

import numpy as np
import pytest

REF = "/root/reference/testsuite"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_parse_all_reference_cases():
    from rlshaders_tpu.scene import ass_parser

    import glob

    for case in sorted(glob.glob(f"{REF}/mtoa/*/data/*.ass")):
        nodes = ass_parser.parse(case)
        types = {n.type for n in nodes}
        assert "options" in types and "persp_camera" in types, case
        assert any(n.type == "polymesh" for n in nodes), case


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_b85_mesh_invariants():
    from rlshaders_tpu.scene import ass_parser

    nodes = ass_parser.parse(f"{REF}/mtoa/0001/data/ggx_teflon.ass")
    for n in nodes:
        if n.type != "polymesh":
            continue
        nsides = n.get("nsides")
        vidxs = np.asarray(n.get("vidxs")).reshape(-1)
        vlist = np.asarray(n.get("vlist")).reshape(-1, 3)
        total = int(np.sum(nsides)) if np.ndim(nsides) else int(nsides)
        assert total == vidxs.size, n.name
        assert vidxs.max() < vlist.shape[0], n.name
        assert np.isfinite(vlist).all(), n.name


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_quad_light_vertices_unit_square():
    from rlshaders_tpu.scene import ass_parser

    nodes = ass_parser.parse(f"{REF}/mtoa/0009/data/skin_probe_sampling.ass")
    ql = next(n for n in nodes if n.type == "quad_light")
    v = np.asarray(ql.get("vertices")).reshape(4, 3)
    np.testing.assert_allclose(np.abs(v[:, :2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(v[:, 2], 0.0, atol=1e-6)


def test_exr_roundtrip_float_and_half(tmp_path):
    from rlshaders_tpu.io import exr

    img = np.random.default_rng(0).random((33, 47, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write_rgb(p, img, half=False)
    np.testing.assert_array_equal(exr.read_rgb(p), img)
    exr.write_rgb(p, img, half=True)
    assert np.abs(exr.read_rgb(p) - img).max() < 5e-4


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_exr_reads_arnold_goldens():
    from rlshaders_tpu.io import exr

    # plain golden
    rgb = exr.read_rgb(f"{REF}/mtoa/0001/ref/ref.exr")
    assert rgb.shape == (256, 256, 3)
    assert 0.2 < rgb.mean() < 1.0
    # autocropped golden pasted back into the display window
    rgb = exr.read_rgb(f"{REF}/mtoa/0009/ref/ref.exr")
    assert rgb.shape == (256, 256, 3)
    assert rgb[0, 0].max() == 0.0  # outside the data window


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_scene_build_tables():
    from rlshaders_tpu.scene import build as buildmod

    sc = buildmod.build(f"{REF}/mtoa/0001/data/ggx_teflon.ass")
    g = sc.geometry
    t = g.v0.shape[0]
    assert t > 30000
    for arr in (g.v0, g.e1, g.e2, g.n0, g.uv0):
        assert int(arr.shape[0]) == t
    assert np.isfinite(np.asarray(g.v0)).all()
    # material table resolves every mesh's shader
    assert int(np.asarray(g.mat_id).max()) < len(sc.material_names)
    # lights built with normalize-folded radiance
    assert np.asarray(sc.quad_lights.area).min() > 0
    assert sc.sky.exists


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_geometry_bucket_padding():
    """Per-triangle tables are padded to power-of-two buckets (traced-operand
    shapes -> shared TPU compiles across same-bucket scenes, docs/perf.md);
    the padded tail is inert (invisible + edge-degenerate) and the accel
    builders strip it (cluster tables bucket separately with all-padding
    clusters behind degenerate AABBs)."""
    from rlshaders_tpu.accel import trace as tracemod
    from rlshaders_tpu.scene import build as buildmod

    sc = buildmod.build(f"{REF}/mtoa/0009/data/skin_probe_sampling.ass")
    g = sc.geometry
    t = int(g.v0.shape[0])
    assert t >= 512 and (t & (t - 1)) == 0, t  # power-of-two, floor 512
    vis = np.asarray(g.visibility)
    assert vis[-1] == 0  # padded tail present for this 400-tri scene
    pad = vis == 0
    assert np.abs(np.asarray(g.e1)[pad]).max() == 0.0
    accel = tracemod.build(g)
    # cluster bucket: power-of-two cluster count, padded clusters degenerate
    c = int(accel.packed.oct_projid.shape[1])
    assert (c & (c - 1)) == 0, c
    # BVH sees only real triangles
    assert int(np.asarray(accel.tree.tri_order).max()) < t - int(pad.sum()) + 1

    # same bucket class as 0010 (the motivating pair)
    sc2 = buildmod.build(f"{REF}/mtoa/0010/data/skin_diffusion.ass")
    assert int(sc2.geometry.v0.shape[0]) == t
