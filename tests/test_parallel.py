"""Multi-device sharding tests on the virtual 8-CPU mesh (conftest.py).

Validates SURVEY.md section 2.2's one distributed component: the full render
pipeline data-parallel over a ("dp",) jax.sharding.Mesh with psum
framebuffer assembly. The key property is determinism — per-tile RNG keys
fold the GLOBAL tile index, so the sharded render must equal the
single-device render to float-accumulation tolerance.
"""
import jax
import numpy as np
import pytest

from rlshaders_tpu.core import rng
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def demo():
    return pmesh.demo_scene()


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_device(demo):
    scene, accel = demo
    kw = dict(tile_pixels=64, aa_samples=2, xres=16, yres=16)
    ref = wavefront.render(scene, accel, **kw)
    mesh = pmesh.make_mesh(8)
    out = pmesh.render_sharded(scene, accel, mesh, **kw)
    a = ref["RGBA"]
    b = out["RGBA"]
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
    assert a.max() > 0.0
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5)
    # AOV planes shard identically
    for name in ("direct_diffuse", "direct_specular", "indirect_diffuse"):
        np.testing.assert_allclose(out[name], ref[name], rtol=2e-4, atol=2e-5)


def test_sharded_render_uneven_tiles(demo):
    """Tile count not divisible by dp: padding tiles must not contaminate."""
    scene, accel = demo
    kw = dict(tile_pixels=100, aa_samples=1, xres=18, yres=18)
    ref = wavefront.render(scene, accel, **kw)
    mesh = pmesh.make_mesh(8)
    out = pmesh.render_sharded(scene, accel, mesh, **kw)
    np.testing.assert_allclose(out["RGBA"], ref["RGBA"], rtol=2e-4, atol=2e-5)


def test_sharded_shade_step_two_axis_mesh():
    """The ("dp","sp") microbench path with its pmean collective."""
    mesh = pmesh.make_mesh(8, sp=2)
    params, wo = pmesh.demo_batch(64)
    out = pmesh.sharded_shade_step(mesh, params, wo, rng.stream(0), spp=8)
    out = np.asarray(jax.block_until_ready(out))
    assert out.shape == (64, 3)
    assert np.all(np.isfinite(out))


@pytest.mark.slow
def test_sharded_real_testsuite_scene_with_sss():
    """A REAL testsuite scene (0009, rlSkin: two GGX lobes + SSS probe
    stage) through the sharded pipeline: sharded == single-device on the
    8-CPU mesh. Covers SSS-under-shard_map on real geometry — previously
    only the procedural dryrun scene exercised it (VERDICT r4 #7)."""
    import os

    from rlshaders_tpu.accel import trace as tracemod
    from rlshaders_tpu.scene import build as buildmod

    path = ("/root/reference/testsuite/mtoa/0009/data/"
            "skin_probe_sampling.ass")
    if not os.path.exists(path):
        pytest.skip("reference testsuite not present")
    scene = buildmod.build(path)
    # canary-style reductions: structure is what's under test, not noise
    scene.options.gi_diffuse_samples = 1
    scene.options.gi_glossy_samples = 1
    scene.options.gi_sss_samples = 2
    accel = tracemod.build(scene.geometry)
    kw = dict(tile_pixels=256, aa_samples=1, xres=32, yres=32)
    ref = wavefront.render(scene, accel, **kw)
    mesh = pmesh.make_mesh(8)
    out = pmesh.render_sharded(scene, accel, mesh, **kw)
    a = np.asarray(ref["RGBA"], np.float32)
    b = np.asarray(out["RGBA"], np.float32)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert a.max() > 0.0
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5)
