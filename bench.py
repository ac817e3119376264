"""Benchmark: Disney BSDF eval+sample throughput (the BASELINE.json headline).

Renders the shading inner loop of a 1080p Disney material-test grid: for
every pixel, importance-sample the specular lobe mixture, evaluate the full
Disney BRDF (diffuse + GTR2-aniso specular + clearcoat + sheen) and both MIS
pdfs — the exact per-sample work rlDisney's shader_evaluate does per light
sample (reference rlDisney.cpp:105-602), batched over the frame under jit.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Gsamples/s", "vs_baseline": N}
vs_baseline is against the 2 Gsamples/s v5e-8 target from BASELINE.md,
scaled to a single chip (0.25 Gsamples/s/chip).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from rlshaders_tpu.bsdf import disney
from rlshaders_tpu.core import rng

WIDTH, HEIGHT = 1920, 1080
SPP = 8  # samples per pixel per timed step


def make_scene_batch():
    """1080p material-test grid: roughness x metallic over the frame."""
    n = WIDTH * HEIGHT
    x = (jnp.arange(n) % WIDTH).astype(jnp.float32) / WIDTH
    y = (jnp.arange(n) // WIDTH).astype(jnp.float32) / HEIGHT
    params = disney.make_params(
        base_color=jnp.stack([0.7 * jnp.ones_like(x), 0.3 + 0.4 * x, 0.2 + 0.6 * y], -1),
        roughness=0.05 + 0.9 * x,
        metallic=y,
        specular=0.8,
        specular_tint=0.3,
        anisotropic=0.3 * x,
        sheen=0.5 * y,
        sheen_tint=0.5,
        clearcoat=0.0,  # keep sampler == pdf (reference clearcoat sampler quirk)
        clearcoat_gloss=0.7,
        subsurface=0.2,
    )
    t = 0.3 + 0.5 * y
    st = jnp.sqrt(1.0 - t * t)
    wo = jnp.stack([st, jnp.zeros_like(t), t], -1)
    return params, wo


def step(params, wo, key, cc: bool = True):
    """SPP spec samples + SPP diffuse samples, full eval + pdf + MIS blend."""
    n = wo.shape[0]
    u = jax.random.uniform(key, (n, SPP, 4), dtype=jnp.float32)
    pb = disney.expand_sample_axis(params)
    wo_b = wo[:, None, :]

    wi_s = disney.sample_specular(pb, wo_b, u[..., 0], u[..., 1], cc)
    f_s = disney.eval_specular_cos(pb, wo_b, wi_s, cc)
    p_s = disney.pdf_specular(pb, wo_b, wi_s, cc)
    p_sd = disney.pdf_diffuse(pb, wo_b, wi_s)
    w_s = p_s / jnp.maximum(p_s + p_sd, 1e-9)

    wi_d = disney.sample_diffuse(pb, wo_b, u[..., 2], u[..., 3])
    f_d = disney.eval_diffuse_cos(pb, wo_b, wi_d)
    p_d = disney.pdf_diffuse(pb, wo_b, wi_d)
    p_ds = disney.pdf_specular(pb, wo_b, wi_d, cc)
    w_d = p_d / jnp.maximum(p_d + p_ds, 1e-9)

    est = (
        f_s * (w_s / jnp.maximum(p_s, 1e-9))[..., None]
        + f_d * (w_d / jnp.maximum(p_d, 1e-9))[..., None]
    )
    return est.mean(axis=1)


def main():
    params, wo = make_scene_batch()
    cc = disney.has_clearcoat(params)
    fn = jax.jit(lambda p, w, k: step(p, w, k, cc))
    key = rng.stream(0)

    out = fn(params, wo, key)
    out.block_until_ready()

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = fn(params, wo, rng.fold(key, i))
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    # each pixel-sample draws TWO full BSDF samples (specular mixture and
    # diffuse), each with eval + both MIS pdfs — count each as one
    # "BSDF eval+sample" unit
    samples = WIDTH * HEIGHT * SPP * 2
    gsps = samples / dt / 1e9
    baseline_per_chip = 2.0 / 8.0  # BASELINE target is a v5e-8 slice
    print(
        json.dumps(
            {
                "metric": "disney_bsdf_eval_sample_1080p",
                "value": round(gsps, 4),
                "unit": "Gsamples/s",
                "vs_baseline": round(gsps / baseline_per_chip, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
