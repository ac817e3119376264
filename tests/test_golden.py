"""Opt-in golden-image regression tests (`pytest -m golden`).

Exercises the FULL parse -> build -> BVH -> trace -> shade -> compare path
against the reference's own checked-in goldens (testsuite/mtoa/*/ref/ref.exr,
the same images runtest.py gates on, reference runtest.py:220-244) at
reduced resolution/sampling so a CPU run stays tractable. The thresholds are
regression canaries (structural-change detectors), far looser than the
full-res RMS < 0.005 fidelity gate the CLI harness applies on TPU — at 48x48
with 1 AA sample the Monte-Carlo noise floor alone dominates.

Excluded from the default run: `pytest -m golden tests/test_golden.py`.
"""
import os

import numpy as np
import pytest

SUITE = "/root/reference/testsuite"

# (case, scene file, rmse bound at 48x48 aa1 vs box-downsampled golden)
CASES = [
    ("0001", "ggx_teflon.ass", 0.10),
    ("0004", "disney.ass", 0.10),
]

pytestmark = pytest.mark.golden


def _downsample(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    f = h // size
    return img[: size * f, : size * f].reshape(size, f, size, f, 3).mean((1, 3))


@pytest.mark.parametrize("case,scene_file,bound", CASES)
def test_golden_case(case, scene_file, bound):
    from rlshaders_tpu.accel import trace as tracemod
    from rlshaders_tpu.integrator import wavefront
    from rlshaders_tpu.io import exr
    from rlshaders_tpu.scene import build as buildmod

    path = os.path.join(SUITE, "mtoa", case, "data", scene_file)
    scene = buildmod.build(path)
    # shrink the indirect fan-out so the CPU reference path stays quick;
    # this raises noise, which the loose bound absorbs
    scene.options.gi_diffuse_samples = 2
    scene.options.gi_glossy_samples = 2
    accel = tracemod.build(scene.geometry)
    out = wavefront.render(
        scene, accel, aa_samples=1, xres=48, yres=48, tile_pixels=4096
    )
    test = np.asarray(out["RGBA"], np.float32)
    ref = _downsample(
        exr.read_rgb(os.path.join(SUITE, "mtoa", case, "ref", "ref.exr")), 48
    )
    rmse = float(np.sqrt(((ref - test) ** 2).mean()))
    assert np.isfinite(test).all(), "non-finite radiance"
    assert rmse < bound, f"case {case}: rmse {rmse:.4f} over bound {bound}"
