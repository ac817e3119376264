"""Property tests for the GGX BSDF layer.

These mechanize the validation the reference only did by eye with
SampleWriter dumps (reference src/rlUtil.h:98-156, rlGgx.cpp:202-224):
sample/pdf consistency, hemisphere containment of VNDF samples, energy
bounds, and reciprocity-style invariants.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlshaders_tpu.bsdf import ggx
from rlshaders_tpu.core import rng
from rlshaders_tpu.core import vecmath as vm


def _sphere_grid(n_theta=256, n_phi=512, hemisphere=False):
    """Quadrature grid over the (hemi)sphere; returns dirs (N,3), weights (N,)."""
    top = np.pi / 2 if hemisphere else np.pi
    theta = (np.arange(n_theta) + 0.5) / n_theta * top
    phi = (np.arange(n_phi) + 0.5) / n_phi * 2 * np.pi
    t, p = np.meshgrid(theta, phi, indexing="ij")
    d = np.stack(
        [np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)], axis=-1
    ).reshape(-1, 3)
    w = (np.sin(t) * (top / n_theta) * (2 * np.pi / n_phi)).reshape(-1)
    return jnp.asarray(d, jnp.float32), jnp.asarray(w, jnp.float32)


def _view(theta_deg):
    t = np.deg2rad(theta_deg)
    return jnp.asarray([np.sin(t), 0.0, np.cos(t)], jnp.float32)


# roughness 0.2 is the narrowest lobe the fixed quadrature grid resolves
@pytest.mark.parametrize("roughness,aniso", [(0.2, 0.0), (0.35, 0.0), (0.7, 0.0), (0.4, 0.8)])
@pytest.mark.parametrize("theta_deg", [5.0, 45.0, 80.0])
def test_vndf_pdf_integrates_to_one(roughness, aniso, theta_deg):
    """The reflection pdf D*G1/(4 cos_o) must be a proper density over wi."""
    p = ggx.make_params(jnp.ones(3), roughness, 1.5, aniso)
    wo = _view(theta_deg)
    dirs, w = _sphere_grid()
    h = vm.normalize(dirs + wo)
    pdf = ggx.vndf_pdf(p, jnp.broadcast_to(wo, dirs.shape), h)
    # Jacobian dwh/dwi = 1/(4 |wi.h|) is already folded into the pdf form.
    total = float(jnp.sum(pdf * w))
    assert abs(total - 1.0) < 0.02, total


@pytest.mark.parametrize("roughness,max_miss", [(0.1, 0.005), (0.35, 0.06), (0.7, 0.25)])
@pytest.mark.parametrize("theta_deg", [5.0, 45.0, 85.0])
def test_vndf_samples_below_horizon_bounded(roughness, theta_deg, max_miss):
    """Below-horizon VNDF reflections (rejected with weight 0, the 'missing
    samples' the reference's SampleWriter counts, rlUtil.h:144-154) occur at
    the rate GGX tails predict — e.g. ~alpha^2/(alpha^2+1) at normal
    incidence — and never dominate."""
    p = ggx.make_params(jnp.ones(3), roughness, 1.5)
    wo = _view(theta_deg)
    n = 20000
    u = jax.random.uniform(rng.stream(3), (n, 2))
    wos = jnp.broadcast_to(wo, (n, 3))
    wi, _ = ggx.sample(p, wos, u[:, 0], u[:, 1])
    below = float(jnp.mean((wi[:, 2] < -1e-4).astype(jnp.float32)))
    assert below < max_miss, below
    # and the rejected directions carry no energy
    f = ggx.eval_brdf(p, wos, wi)
    masked = jnp.where((wi[:, 2] < 0)[:, None], jnp.abs(f), 0.0)
    assert float(jnp.max(masked)) == 0.0


@pytest.mark.parametrize("roughness,theta_deg", [(0.35, 30.0), (0.6, 60.0)])
def test_vndf_sample_pdf_chi2_consistency(roughness, theta_deg):
    """Histogram of sampled directions must match the claimed pdf."""
    p = ggx.make_params(jnp.ones(3), roughness, 1.5)
    wo = _view(theta_deg)
    n = 400000
    u = jax.random.uniform(rng.stream(4), (n, 2))
    wi, _ = ggx.sample(p, jnp.broadcast_to(wo, (n, 3)), u[:, 0], u[:, 1])
    wi = np.asarray(wi)

    nt, npph = 16, 32
    theta = np.arccos(np.clip(wi[:, 2], -1, 1))
    phi = np.mod(np.arctan2(wi[:, 1], wi[:, 0]), 2 * np.pi)
    it = np.minimum((theta / (np.pi / 2) * nt).astype(int), nt)  # overflow bin for below-horizon
    ip = np.minimum((phi / (2 * np.pi) * npph).astype(int), npph - 1)
    counts = np.zeros((nt + 1, npph))
    np.add.at(counts, (it, ip), 1.0)
    counts = counts[:nt] / n  # observed probability per bin

    # Expected probability per bin from the pdf via quadrature
    tg = (np.arange(nt)[:, None] + 0.5) / nt * (np.pi / 2)
    pg = (np.arange(npph)[None, :] + 0.5) / npph * 2 * np.pi
    sub = 4  # sub-sample each bin
    exp = np.zeros((nt, npph))
    for dt in range(sub):
        for dp in range(sub):
            t = (np.arange(nt)[:, None] + (dt + 0.5) / sub) / nt * (np.pi / 2)
            ph = (np.arange(npph)[None, :] + (dp + 0.5) / sub) / npph * 2 * np.pi
            d = np.stack(
                [np.sin(t) * np.cos(ph), np.sin(t) * np.sin(ph), np.cos(t) * np.ones_like(ph)],
                axis=-1,
            )
            h = vm.normalize(jnp.asarray(d.reshape(-1, 3), jnp.float32) + wo)
            pdf = np.asarray(
                ggx.vndf_pdf(p, jnp.broadcast_to(wo, (h.shape[0], 3)), h)
            ).reshape(nt, npph)
            dw = np.sin(t) * (np.pi / 2 / nt / sub) * (2 * np.pi / npph / sub)
            exp += pdf * dw
    # Compare where expected bin mass gives enough MC counts (>=400)
    mask = exp > 1e-3
    rel = np.abs(counts[mask] - exp[mask]) / exp[mask]
    assert np.quantile(rel, 0.9) < 0.15, np.quantile(rel, 0.9)


@pytest.mark.parametrize("roughness,theta_deg", [(0.2, 30.0), (0.5, 55.0)])
def test_mc_estimate_matches_quadrature(roughness, theta_deg):
    """E[f*cos / pdf] from importance sampling == grid integral of f*cos."""
    p = ggx.make_params(jnp.ones(3), roughness, 1.5)
    wo = _view(theta_deg)

    dirs, w = _sphere_grid(hemisphere=True)
    f = ggx.eval_brdf(p, jnp.broadcast_to(wo, dirs.shape), dirs)[:, 0]
    ref_integral = float(jnp.sum(f * w))

    n = 200000
    u = jax.random.uniform(rng.stream(5), (n, 2))
    wi, _ = ggx.sample(p, jnp.broadcast_to(wo, (n, 3)), u[:, 0], u[:, 1])
    pdf = ggx.pdf(p, jnp.broadcast_to(wo, (n, 3)), wi)
    fs = ggx.eval_brdf(p, jnp.broadcast_to(wo, (n, 3)), wi)[:, 0]
    est = float(jnp.mean(jnp.where(wi[:, 2] > 0, fs / pdf, 0.0)))
    assert abs(est - ref_integral) / max(ref_integral, 1e-6) < 0.03


def test_energy_conservation_white_furnace_bound():
    """Directional albedo of the reflection lobe never exceeds 1."""
    dirs, w = _sphere_grid(hemisphere=True)
    for roughness in (0.1, 0.4, 0.9):
        for theta in (10.0, 45.0, 80.0):
            p = ggx.make_params(jnp.ones(3), roughness, 1.5)
            wo = _view(theta)
            f = ggx.eval_brdf(p, jnp.broadcast_to(wo, dirs.shape), dirs)[:, 0]
            albedo = float(jnp.sum(f * w))
            assert albedo <= 1.0 + 1e-3, (roughness, theta, albedo)


def test_fresnel_dielectric_limits():
    p = ggx.make_params(jnp.ones(3), 0.3, 1.5)
    n = jnp.array([0.0, 0.0, 1.0])
    # Normal incidence: F0 = ((1.5-1)/(1.5+1))^2 = 0.04
    f0 = float(ggx.fresnel_dielectric(n, n, p.ior_in, p.ior_out))
    assert abs(f0 - 0.04) < 1e-3
    # Grazing: -> 1
    g = vm.normalize(jnp.array([1.0, 0.0, 1e-3]))
    fg = float(ggx.fresnel_dielectric(g, n, p.ior_in, p.ior_out))
    assert fg > 0.98
    # TIR from the dense side
    p_exit = ggx.make_params(jnp.ones(3), 0.3, 1.5, entering=False)
    gr = vm.normalize(jnp.array([1.0, 0.0, 0.5]))
    ft = float(ggx.fresnel_dielectric(gr, n, p_exit.ior_in, p_exit.ior_out))
    assert ft == 1.0


def test_refract_direction_snell():
    p = ggx.make_params(jnp.ones(3), 0.1, 1.5)
    m = jnp.array([0.0, 0.0, 1.0])
    wo = vm.normalize(jnp.array([0.5, 0.0, 0.866]))
    wi, tir = ggx.refract_direction(m, wo, p.ior_in, p.ior_out)
    assert not bool(tir)
    # Snell: sin_t = sin_i / 1.5, direction on the other side
    sin_i = float(jnp.sqrt(wo[0] ** 2 + wo[1] ** 2))
    sin_t = float(jnp.sqrt(wi[0] ** 2 + wi[1] ** 2))
    assert wi[2] < 0
    assert abs(sin_t - sin_i / 1.5) < 1e-4
    # Dense-to-sparse TIR beyond the critical angle
    p2 = ggx.make_params(jnp.ones(3), 0.1, 1.5, entering=False)
    wo2 = vm.normalize(jnp.array([0.9, 0.0, np.sqrt(1 - 0.81)]))
    _, tir2 = ggx.refract_direction(m, wo2, p2.ior_in, p2.ior_out)
    assert bool(tir2)


def test_ndf_kernel_pdf_integrates():
    p = ggx.make_params(jnp.ones(3), 0.4, 1.5)
    wo = _view(35.0)
    dirs, w = _sphere_grid()
    h = vm.normalize(dirs + wo)
    pdf = ggx.ndf_pdf(p, jnp.broadcast_to(wo, dirs.shape), h)
    total = float(jnp.sum(pdf * w))
    assert abs(total - 1.0) < 0.03, total
