"""Property tests for the BSSRDF diffusion profiles."""
import jax
import jax.numpy as jnp
import numpy as np

from rlshaders_tpu.bsdf import sss_profiles as sp
from rlshaders_tpu.core import rng


def test_nd_profile_normalization():
    """The Burley profile integrates to 1 over the plane: int R(r) 2 pi r dr = 1."""
    p = sp.make_nd_profile(jnp.array([0.3, 0.5, 0.9]))
    r = jnp.linspace(1e-5, 30.0, 400000)
    dr = float(r[1] - r[0])
    vals = sp.nd_eval(p, r)  # (N, 3)
    # nd_eval returns 1.0 below r<eps; exclude the first sample's special case
    integral = np.asarray(jnp.sum(vals * (2 * np.pi * r[:, None]) * dr, axis=0))
    np.testing.assert_allclose(integral, 1.0, rtol=0.02)


def test_nd_radius_sampling_matches_pdf():
    """Histogram of sampled radii (over the disk) matches getPdf."""
    dist = jnp.array([0.2, 0.4, 0.8])
    p = sp.make_nd_profile(dist)
    n = 500000
    u = jax.random.uniform(rng.stream(11), (n,))
    r = np.asarray(sp.nd_sample_radius(p, u))
    assert (r >= 0).all()

    bins = np.linspace(0, float(p.max_radius) * 1.5, 60)
    hist, edges = np.histogram(r, bins=bins, density=True)  # pdf in r (linear)
    centers = 0.5 * (edges[1:] + edges[:-1])
    # getPdf is a density over the disk area (channel selection already
    # averaged in); the radial density is pdf_disk * 2 pi r.
    pdf_disk = np.asarray(sp.nd_pdf(p, jnp.asarray(centers, jnp.float32)))
    pdf_r = pdf_disk * 2 * np.pi * centers
    mask = hist > 0.05 * hist.max()
    rel = np.abs(hist[mask] - pdf_r[mask]) / pdf_r[mask]
    assert np.quantile(rel, 0.9) < 0.1, np.quantile(rel, 0.9)


def test_nd_sampled_radius_within_sane_range():
    p = sp.make_nd_profile(jnp.array([0.5, 0.5, 0.5]))
    u = jax.random.uniform(rng.stream(12), (100000,))
    r = np.asarray(sp.nd_sample_radius(p, u))
    # inverse CDF is truncated at max_radius
    assert r.max() <= float(p.max_radius) + 1e-4


def test_nd_degenerate_distance():
    p = sp.make_nd_profile(jnp.zeros(3))
    assert float(sp.nd_sample_radius(p, jnp.array(0.7))) == 0.0
    assert float(sp.nd_pdf(p, jnp.array(0.1))) == 1.0
    np.testing.assert_allclose(np.asarray(sp.nd_eval(p, jnp.array(0.1))), 0.0)


def test_gaussian_profile_roundtrip():
    p = sp.make_gaussian_profile(jnp.array([1.0, 1.0, 1.0]))
    u = jnp.linspace(0.001, 0.999, 1000)
    r = sp.gaussian_sample_radius(p, u)
    assert float(jnp.max(r)) <= float(p.max_radius) + 1e-3
    # pdf normalizes over the truncated disk: int pdf 2 pi r dr = 1
    rr = jnp.linspace(1e-4, float(p.max_radius), 200000)
    dr = float(rr[1] - rr[0])
    total = float(jnp.sum(sp.gaussian_pdf(p, rr) * 2 * np.pi * rr * dr))
    np.testing.assert_allclose(total, 1.0, rtol=0.01)


def test_select_dist_lobe_uniform():
    u = jnp.linspace(0.0, 0.9999, 30000)
    idx, xr = sp.select_dist_lobe(u)
    counts = np.bincount(np.asarray(idx), minlength=3) / 30000
    np.testing.assert_allclose(counts, 1 / 3, atol=0.01)
    assert float(jnp.min(xr)) >= 0.0 and float(jnp.max(xr)) <= 1.0


def test_cubic_profile_consistency():
    """Cubic lanes (Arnold-4 standard falloff): the normalized profile IS
    the disk pdf, it integrates to exactly 1 over its compact support, and
    the bisection inverse-CDF sampler matches the pdf."""
    d = jnp.array([0.7, 0.7, 0.7])
    p = sp.make_nd_profile(d, cubic=jnp.asarray(True))
    assert float(p.max_radius) == np.float32(0.7)  # support = d, not 3d

    # mass over the disk = 1
    rr = jnp.linspace(1e-5, 0.7, 200000)
    dr = float(rr[1] - rr[0])
    total = float(jnp.sum(sp.nd_pdf(p, rr) * 2 * np.pi * rr * dr))
    np.testing.assert_allclose(total, 1.0, rtol=0.005)

    # eval == pdf per channel for the normalized profile
    ev = np.asarray(sp.nd_eval(p, rr[:1000]))
    pdf = np.asarray(sp.nd_pdf(p, rr[:1000]))
    np.testing.assert_allclose(ev.mean(-1), pdf, rtol=1e-4)

    # sampler matches the pdf: histogram chi^2-ish check
    u = jnp.linspace(0.0005, 0.9995, 40000)
    r = np.asarray(sp.nd_sample_radius(p, u))
    assert r.max() <= 0.7 + 1e-4
    hist, edges = np.histogram(r, bins=24, range=(0, 0.7), density=False)
    mid = 0.5 * (edges[:-1] + edges[1:])
    width = edges[1] - edges[0]
    expect = np.asarray(sp.nd_pdf(p, jnp.asarray(mid))) * 2 * np.pi * mid
    expect = expect / expect.sum()
    got = hist / hist.sum()
    np.testing.assert_allclose(got, expect, atol=2.5 / np.sqrt(40000 / 24))


def test_cubic_and_burley_lanes_coexist():
    """Mixed batches: cubic flag selects per lane without disturbing the
    Burley lanes (the fused SSS program shades standard + rlSkin hits in
    one batch)."""
    d = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]), (4, 3))
    cubic = jnp.array([True, False, True, False])
    p = sp.make_nd_profile(d, cubic)
    np.testing.assert_allclose(
        np.asarray(p.max_radius), [0.5, 1.5, 0.5, 1.5])
    r = jnp.full((4,), 0.3)
    pdf = np.asarray(sp.nd_pdf(p, r))
    p_c = sp.make_nd_profile(d[:1], jnp.asarray([True]))
    p_b = sp.make_nd_profile(d[:1], jnp.asarray([False]))
    np.testing.assert_allclose(pdf[0], np.asarray(sp.nd_pdf(p_c, r[:1]))[0])
    np.testing.assert_allclose(pdf[1], np.asarray(sp.nd_pdf(p_b, r[:1]))[0])
