"""Beckmann (cook_torrance) lobe property tests: pdf normalization and
sample<->pdf consistency, mirroring the GGX tests."""
import jax
import jax.numpy as jnp
import numpy as np

from rlshaders_tpu.bsdf import beckmann
from rlshaders_tpu.core.vec3 import V3


def _sph(theta, phi):
    st = jnp.sin(theta)
    return V3(st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta))


def test_ndf_pdf_integrates_to_one():
    # integral of D(m) cos(m) over the hemisphere == 1
    n = 256
    th = (jnp.arange(n) + 0.5) / n * (jnp.pi / 2)
    ph = (jnp.arange(n) + 0.5) / n * (2 * jnp.pi)
    T, P = jnp.meshgrid(th, ph, indexing="ij")
    m = _sph(T.ravel(), P.ravel())
    for alpha in (0.04, 0.2, 0.5):
        d = beckmann.d_beckmann(m, alpha) * jnp.cos(T.ravel())
        integ = float(jnp.sum(d * jnp.sin(T.ravel()))) * (jnp.pi / 2 / n) * (
            2 * jnp.pi / n
        )
        assert abs(integ - 1.0) < 2e-2, (alpha, integ)


def test_sample_matches_pdf():
    # MC estimate of integral pdf(wi) dwi over sampled wi should be ~1 and
    # the sampled directions' histogram should match pdf via a chi^2-ish
    # ratio check on cos-theta bands.
    key = jax.random.PRNGKey(7)
    n = 200_000
    rx, ry = jax.random.uniform(key, (2, n))
    wo = V3(jnp.full((n,), 0.4472), jnp.zeros((n,)), jnp.full((n,), 0.8944))
    alpha = 0.15
    wi = beckmann.sample(wo, alpha, rx, ry)
    p = beckmann.pdf(wo, wi, alpha)
    up = wi.z > 1e-4
    # E[ f(wi)/pdf(wi) ] with f = pdf restricted to the upper hemisphere
    # equals the fraction of samples falling there, trivially; instead check
    # the standard identity E[ cos(wi)/pdf ] == integral of cos over the
    # sampled-lobe support (finite, positive) -- and that pdf > 0 wherever
    # samples land.
    assert float(jnp.min(jnp.where(up, p, 1.0))) > 0.0
    # histogram check: band [0.7, 0.9] of wi.z
    zlo, zhi = 0.7, 0.9
    frac = float(jnp.mean(up & (wi.z > zlo) & (wi.z < zhi)))
    # MC integral of pdf over that band using uniform-hemisphere points
    k2 = jax.random.PRNGKey(11)
    u = jax.random.uniform(k2, (2, 400_000))
    z = zlo + (zhi - zlo) * u[0]
    phi = 2 * jnp.pi * u[1]
    s = jnp.sqrt(1 - z * z)
    wim = V3(s * jnp.cos(phi), s * jnp.sin(phi), z)
    area = (zhi - zlo) * 2 * jnp.pi
    wo1 = V3(jnp.full((400_000,), 0.4472), jnp.zeros((400_000,)),
             jnp.full((400_000,), 0.8944))
    integ = float(jnp.mean(beckmann.pdf(wo1, wim, alpha)) * area)
    assert abs(frac - integ) < 0.02, (frac, integ)


def test_gd_reciprocity():
    key = jax.random.PRNGKey(3)
    n = 1000
    u = jax.random.uniform(key, (4, n))
    th1 = u[0] * 1.3
    th2 = u[1] * 1.3
    wo = _sph(th1, u[2] * 2 * jnp.pi)
    wi = _sph(th2, u[3] * 2 * jnp.pi)
    a = 0.2
    g1 = beckmann.gd(wo, wi, a)
    g2 = beckmann.gd(wi, wo, a)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4)
