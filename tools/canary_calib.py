"""Measure the 48x48 canary RMSE for every testsuite case (CPU) to
calibrate tests/test_golden.py bounds. Usage: python tools/canary_calib.py
[cases...]"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SUITE = "/root/reference/testsuite"

CASES = {
    "0001": "ggx_teflon.ass",
    "0002": "ggx_gold.ass",
    "0003": "ggx_anisotropic.ass",
    "0004": "disney.ass",
    "0005": "disney_subsurface.ass",
    "0006": "disney_metallic.ass",
    "0007": "disney_specular.ass",
    "0008": "disney_anisotropic.ass",
    "0009": "skin_probe_sampling.ass",
    "0010": "skin_diffusion.ass",
}


def downsample(img, size):
    h, w = img.shape[:2]
    f = h // size
    return img[: size * f, : size * f].reshape(size, f, size, f, 3).mean((1, 3))


def main():
    from rlshaders_tpu.accel import trace as tracemod
    from rlshaders_tpu.integrator import wavefront
    from rlshaders_tpu.io import exr
    from rlshaders_tpu.scene import build as buildmod

    wanted = sys.argv[1:] or sorted(CASES)
    for case in wanted:
        scene_file = CASES[case]
        path = os.path.join(SUITE, "mtoa", case, "data", scene_file)
        t0 = time.time()
        scene = buildmod.build(path)
        scene.options.gi_diffuse_samples = 2
        scene.options.gi_glossy_samples = 2
        scene.camera = scene.camera._replace(aperture_size=0.0)
        accel = tracemod.build(scene.geometry)
        out = wavefront.render(
            scene, accel, aa_samples=2, xres=48, yres=48, tile_pixels=4096
        )
        test = downsample(np.asarray(out["RGBA"], np.float32), 24)
        ref = downsample(
            exr.read_rgb(os.path.join(SUITE, "mtoa", case, "ref", "ref.exr")),
            24,
        )
        rmse = float(np.sqrt(((ref - test) ** 2).mean()))
        print(f"{case} {scene_file:28s} rmse={rmse:.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
