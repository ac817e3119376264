"""Registry metadata + transparent-shadow semantics tests."""
import os

import numpy as np
import pytest

SCENE_GLASS_SHADOW = """
options
{
 AA_samples 2
 xres 24
 yres 24
 GI_diffuse_depth 0
 GI_glossy_depth 0
 GI_refraction_depth 0
 GI_total_depth 2
 GI_diffuse_samples 1
 GI_glossy_samples 1
 camera "cam"
}
persp_camera
{
 name cam
 fov 60
 matrix
 1 0 0 0
 0 0 -1 0
 0 1 0 0
 0 4 0 1
}
quad_light
{
 name q
 vertices 4 1 POINT
-1 0 -1 1 0 -1 1 0 1 -1 0 1
 decay_type "quadratic"
 matrix
 0.5 0 0 0
 0 0.5 0 0
 0 0 0.5 0
 5 10 0 1
 color 1 1 1
 intensity 100
 exposure 0
 samples 2
 normalize off
 affect_diffuse on
 affect_specular on
 diffuse 1
 specular 1
}
polymesh
{
 name floor
 nsides 4
 vidxs 4 1 UINT
0 1 3 2
 vlist 4 1 POINT
-50 0 50 50 0 50 -50 0 -50 50 0 -50
 nlist 4 1 VECTOR
0 1 0 0 1 0 0 1 0 0 1 0
 nidxs 4 1 UINT
0 1 2 3
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 0 0 1
 shader "floor_sg"
 visibility 255
 opaque on
}
polymesh
{
 name blocker
 nsides 4
 vidxs 4 1 UINT
0 1 3 2
 vlist 4 1 POINT
-0.4 0 0.4 0.4 0 0.4 -0.4 0 -0.4 0.4 0 -0.4
 nlist 4 1 VECTOR
0 1 0 0 1 0 0 1 0 0 1 0
 nidxs 4 1 UINT
0 1 2 3
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 2 0 1
 shader "glass_sg"
 visibility 255
 opaque off
}
MayaShadingEngine
{
 name floor_sg
 beauty floor_mat
}
standard
{
 name floor_mat
 Kd 1.0
 Kd_color 1 1 1
 diffuse_roughness 0
 Ks 0
}
MayaShadingEngine
{
 name glass_sg
 beauty glass_mat
}
rlGgx
{
 name glass_mat
 KdColor 1 1 1
 Kd 0
 KsColor 1 1 1
 Ks 0
 specularRoughness 0.1
 KtColor 0.8 0.8 0.8
 Kt 0.75
 ior 1.5
 opacity 1
 opacity_color 1 1 1
}
"""


def _render(scene_text, tmp_path, **kw):
    from rlshaders_tpu.accel import trace as tracemod
    from rlshaders_tpu.integrator import wavefront
    from rlshaders_tpu.scene import build as buildmod

    p = os.path.join(str(tmp_path), "scene.ass")
    with open(p, "w") as f:
        f.write(scene_text)
    scene = buildmod.build(p)
    accel = tracemod.build(scene.geometry)
    out = wavefront.render(scene, accel, tile_pixels=576, **kw)
    out.pop("__stats__", None)
    return scene, out


def test_transparent_shadow_attenuation(tmp_path):
    """A Kt glass blocker passes 1 - Kt*KtColor-weighted light (rlGgx's
    transparent-shadow behavior, rlGgx.cpp:264-268): the shadowed floor
    keeps ~mean(Kt*KtColor)=0.6 of the unshadowed brightness."""
    scene, out = _render(SCENE_GLASS_SHADOW, tmp_path)
    img = out["RGBA"]
    # the glass's shadow lands around x=-1.25 (light at x=5 through the
    # glass at y=2); the floor there is directly visible to the camera
    shadowed = float(img[11:13, 4:7].mean())
    open_floor = float(img[11:13, 18:22].mean())
    ratio = shadowed / max(open_floor, 1e-9)
    # transmission = mean(Kt*KtColor) = 0.6, modulo cos/distance variation;
    # an opaque blocker would give ~0
    assert 0.3 < ratio < 0.9, (shadowed, open_floor, ratio)


def test_registry_schemas():
    from rlshaders_tpu.models import registry

    assert set(registry.SHADERS) == {"rlGgx", "rlDisney", "rlSkin", "standard"}
    ggx = registry.SHADERS["rlGgx"]
    names = [p.name for p in ggx.params]
    for expected in ("KdColor", "Ks", "specularRoughness", "Kt", "ior",
                     "anisotropic", "opacity"):
        assert expected in names
    assert "refraction" in ggx.aovs
    text = registry.describe()
    assert "rlSkin" in text and "sss_scatter_dist" in text


def test_registry_validation():
    from rlshaders_tpu.models import registry
    from rlshaders_tpu.scene.ass_parser import Node

    node = Node(type="rlDisney", params={"name": "x", "roughness": 2.0})
    warnings = registry.validate_node(node)
    assert any("roughness" in w for w in warnings)
    node2 = Node(type="rlDisney", params={"name": "x", "roughness": 0.5})
    assert not registry.validate_node(node2)
