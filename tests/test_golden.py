"""Golden-image regression canaries for ALL 10 reference cases (default-on).

Exercises the FULL parse -> build -> BVH -> trace -> shade -> compare path
against the reference's own checked-in goldens (testsuite/mtoa/*/ref/ref.exr,
the same images runtest.py gates on, reference runtest.py:220-244) at
reduced resolution/sampling so a CPU run stays tractable. The thresholds are
regression canaries (structural-change detectors), far looser than the
full-res RMS < 0.005 fidelity gate the CLI harness applies on TPU — at 48x48
with 2 AA samples the Monte-Carlo noise floor alone dominates.

Runtime note: cost is compile-dominated (one compile per scene-shape group:
shared scene / aniso / skin bust); warm persistent-cache runs are minutes,
cold ones ~10. Deselect with `-m "not golden"` for quick iteration loops —
the full default run is the pre-commit / driver gate.
"""
import os

import numpy as np
import pytest

SUITE = "/root/reference/testsuite"

# (case, scene file, rmse bound at 48x48 aa2 vs box-downsampled golden).
# Bounds = measured rmse (tools/canary_calib.py, post round-2 fidelity
# passes: 0001 0.163, 0002 0.179, 0003 0.101, 0004 0.143, 0005 0.147,
# 0006 0.159, 0007 0.141, 0008 0.173, 0009 0.042, 0010 0.050) with
# ~40-60% headroom: a structural regression (lost light, wrong lobe,
# broken texture path, dead SSS stage) lands well above these, while
# seed-level MC jitter at 48x48 stays well below.
CASES = [
    ("0001", "ggx_teflon.ass", 0.24),
    ("0002", "ggx_gold.ass", 0.26),
    ("0003", "ggx_anisotropic.ass", 0.16),
    ("0004", "disney.ass", 0.20),
    ("0005", "disney_subsurface.ass", 0.21),
    ("0006", "disney_metallic.ass", 0.23),
    ("0007", "disney_specular.ass", 0.20),
    ("0008", "disney_anisotropic.ass", 0.25),
    ("0009", "skin_probe_sampling.ass", 0.07),
    ("0010", "skin_diffusion.ass", 0.08),
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
    # depth of field at 1 spp is pure lens noise (the shared camera has
    # aperture 0.01, test_geo.ass:42); the canary compares STRUCTURE, so
    # pinhole it — the golden's slight defocus is absorbed by the bound
    scene.camera = scene.camera._replace(aperture_size=0.0)
    accel = tracemod.build(scene.geometry)
    out = wavefront.render(
        scene, accel, aa_samples=2, xres=48, yres=48, tile_pixels=4096
    )
    test48 = np.asarray(out["RGBA"], np.float32)
    assert np.isfinite(test48).all(), "non-finite radiance"
    # compare at 24x24: the gaussian pixel filter at 48x48 blurs ~5x wider
    # (in golden pixels) than the box-downsampled golden, so a 48-res
    # comparison measures filter mismatch, not structure; one more box
    # average on BOTH sides washes the reconstruction difference out
    test = _downsample(test48, 24)
    ref = _downsample(
        exr.read_rgb(os.path.join(SUITE, "mtoa", case, "ref", "ref.exr")), 24
    )
    rmse = float(np.sqrt(((ref - test) ** 2).mean()))
    assert rmse < bound, f"case {case}: rmse {rmse:.4f} over bound {bound}"
