"""Global-energy sensitivity sweep on converged-ish 0004 renders.

The round-4 converged decomposition (out/conv_0004.exr, 16 passes) shows a
near-GLOBAL relative deficit: backdrop -2.0%, ball -3.3%, plinth -2.4%
relative, logo +3% (separately-fitted SSS). Candidate semantic causes, each
a table edit (traced argument — no recompile):

  base    committed state
  wall_l  side walls' diffuse_roughness -> 0 (Lambert bounce cards): tests
          the Oren-Nayar-at-sigma-1 energy hypothesis (our 2-term
          qualitative ON may under-bounce vs Arnold's)
  quads   all quad radiance x1.03 (light-table scale hypothesis)
  sky     sky radiance x1.03
  sss0    logo sss_weight -> 0 (SSS share measurement for deriving the
          standard-Ksss exitance factor from the golden by linearity)

Each variant renders N passes (per-material MEANS converge much faster
than rmse); prints per-material signed means + rmse vs the golden.

Usage: python tools/sweep_global.py [--passes 2] [--variants base,wall_l,...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--passes", type=int, default=2)
p.add_argument("--variants", default="base,wall_l,quads,sky,sss0")
args = p.parse_args()

import numpy as np

import rlshaders_tpu  # noqa: F401
import jax.numpy as jnp

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.io import exr
from rlshaders_tpu.scene import build as buildmod
from rlshaders_tpu.utils import watermark

scene = buildmod.build("/root/reference/testsuite/mtoa/0004/data/disney.ass")
accel = tracemod.build(scene.geometry)
ref = exr.read_rgb("/root/reference/testsuite/mtoa/0004/ref/ref.exr")
wm = watermark.pinned_mask()
mid = np.load("out/matid_0004.npy")
names = list(scene.material_names)
print("materials:", names, flush=True)

base_mats = scene.materials
base_quads = scene.quad_lights
base_sky = scene.sky


def edit_mat(mats, row, **kw):
    upd = {}
    for k, v in kw.items():
        arr = np.asarray(getattr(mats, k)).copy()
        arr[row] = v
        upd[k] = jnp.asarray(arr)
    return mats._replace(**upd)


def variant(tag):
    scene.materials = base_mats
    scene.quad_lights = base_quads
    scene.sky = base_sky
    os.environ.pop("RLS_TEX_ANISO_ALPHA", None)
    os.environ.pop("RLS_LOD_BIAS", None)
    if tag == "aniso0":
        # minor-axis texture filtering (aniso cap 8), keep lod bias -0.5
        os.environ["RLS_TEX_ANISO_ALPHA"] = "0.0"
    elif tag == "aniso0b0":
        os.environ["RLS_TEX_ANISO_ALPHA"] = "0.0"
        os.environ["RLS_LOD_BIAS"] = "0.0"
    elif tag == "aniso025":
        os.environ["RLS_TEX_ANISO_ALPHA"] = "0.25"
    elif tag == "wall_l":
        scene.materials = edit_mat(base_mats, names.index("diffusePlaneSG"),
                                   diffuse_roughness=0.0)
    elif tag == "quads":
        scene.quad_lights = base_quads._replace(
            radiance=base_quads.radiance * 1.03)
    elif tag == "sky":
        scene.sky = base_sky._replace(radiance=base_sky.radiance * 1.03)
    elif tag == "lgamma1":
        # light_gamma NOT applied to light colors (Arnold-semantics probe):
        # radiance was built as c^2.2 * 2^exp / area; undo the gamma on the
        # COLOR factor only -> multiply by c^(1-2.2) = c^-1.2 per channel.
        # Quad colors from test_geo.ass (Top white, Left warm, Right cool).
        import numpy as _np
        cols = _np.array([[1, 1, 1],
                          [1, 0.871516049, 0.641099632],
                          [0.778600514, 0.915192127, 1.0]], _np.float32)
        fac = cols ** (-1.2)
        scene.quad_lights = base_quads._replace(
            radiance=base_quads.radiance * jnp.asarray(fac))
    elif tag == "sss0":
        scene.materials = edit_mat(base_mats, names.index("aiStandard1SG"),
                                   sss_weight=0.0)
    elif tag == "ks0":
        # logo Ks (projection-alpha-driven spec lobe) off: isolates the
        # non-SSS logo bias between the ON-sigma1 diffuse and the Ks lobe
        scene.materials = edit_mat(base_mats, names.index("aiStandard1SG"),
                                   ks=0.0)
    elif tag == "sss0ks0":
        scene.materials = edit_mat(base_mats, names.index("aiStandard1SG"),
                                   sss_weight=0.0, ks=0.0)
    elif tag == "sss0dr0":
        # logo Oren-Nayar sigma 1 -> 0 (Lambert), SSS off: measures our
        # ON-sigma1 level on the only camera-visible sigma=1 surface
        scene.materials = edit_mat(base_mats, names.index("aiStandard1SG"),
                                   sss_weight=0.0, diffuse_roughness=0.0)
    elif tag == "sss0white":
        # file66 is invert+colorOffset(1): our linear chain gives
        # Kd_color = 2 - c in [1,2]. If MtoA clamps the file output at 1,
        # the logo diffuse color is EXACTLY white — emulated by dropping
        # the texture (kd_color defaults to 1).
        scene.materials = edit_mat(base_mats, names.index("aiStandard1SG"),
                                   sss_weight=0.0, kd_tex=-1)
    elif tag == "white":
        scene.materials = edit_mat(base_mats, names.index("aiStandard1SG"),
                                   kd_tex=-1)
    elif tag == "sss0sb":
        # storage-space balance hypothesis: out = 2 - c_storage (balance
        # applied before the 2.2 decode, result treated as linear).
        # SA_logo.jpg is bimodal (bg c_s=1, glyph c_s~0.13 -> c_lin~0.011),
        # so the affine through those two points on DECODED values
        # (gain -0.879, offset 1.879) reproduces it exactly where it
        # matters: glyph 1.87, bg 1.0 (vs our linear chain's 1.99/1.0).
        scene.materials = edit_mat(base_mats, names.index("aiStandard1SG"),
                                   sss_weight=0.0,
                                   kd_tex_gain=(-0.879, -0.879, -0.879),
                                   kd_tex_offset=(1.879, 1.879, 1.879))


def render_mean(tag):
    variant(tag)
    t0 = time.time()
    acc = None
    for s in range(args.passes):
        out = wavefront.render(scene, accel, seed=1000 + s, aa_samples=3,
                               tile_pixels=8192)
        img = np.asarray(out["RGBA"], np.float32)
        acc = img if acc is None else acc + img
    img = acc / args.passes
    d = img - ref
    line = [f"{tag:7s} ({time.time()-t0:.0f}s)"]
    for i, nm in enumerate(names):
        m = (mid == i) & ~wm
        if m.sum() < 100:
            continue
        rel = 100.0 * d[m].mean() / max(ref[m].mean(), 1e-6)
        line.append(f"{nm.split('SG')[0][:10]}: {d[m].mean():+.4f} ({rel:+.2f}%)")
    full = np.sqrt((d[~wm] ** 2).mean())
    line.append(f"rmse {full:.5f}")
    print("  ".join(line), flush=True)
    np.save(f"out/sweep_{tag}.npy", img)


for tag in args.variants.split(","):
    render_mean(tag)
