"""Property tests for the Disney principled BRDF layer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlshaders_tpu.bsdf import disney
from rlshaders_tpu.core import rng
from rlshaders_tpu.core import vecmath as vm


def _view(theta_deg):
    t = np.deg2rad(theta_deg)
    return jnp.asarray([np.sin(t), 0.0, np.cos(t)], jnp.float32)


def _hemi_grid(n_theta=256, n_phi=512):
    theta = (np.arange(n_theta) + 0.5) / n_theta * (np.pi / 2)
    phi = (np.arange(n_phi) + 0.5) / n_phi * 2 * np.pi
    t, p = np.meshgrid(theta, phi, indexing="ij")
    d = np.stack(
        [np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)], axis=-1
    ).reshape(-1, 3)
    w = (np.sin(t) * (np.pi / 2 / n_theta) * (2 * np.pi / n_phi)).reshape(-1)
    return jnp.asarray(d, jnp.float32), jnp.asarray(w, jnp.float32)


def _default(**kw):
    args = dict(base_color=jnp.array([0.8, 0.4, 0.2]), roughness=0.5)
    args.update(kw)
    return disney.make_params(**args)


def test_diffuse_pdf_is_cosine():
    p = _default()
    dirs, w = _hemi_grid()
    pdf = disney.pdf_diffuse(p, None, dirs)
    assert abs(float(jnp.sum(pdf * w)) - 1.0) < 0.01


@pytest.mark.parametrize("roughness,aniso", [(0.3, 0.0), (0.6, 0.0), (0.4, 0.7)])
@pytest.mark.parametrize("theta_deg", [10.0, 45.0, 75.0])
def test_specular_pdf_integrates_to_one(roughness, aniso, theta_deg):
    """With clearcoat=0 the specular mixture pdf is pure GTR2-aniso VNDF and
    must integrate to 1 over reflected directions."""
    p = _default(roughness=roughness, anisotropic=aniso)
    wo = _view(theta_deg)
    # full sphere grid (reflections can go below horizon at grazing)
    nt, nph = 512, 512
    theta = (np.arange(nt) + 0.5) / nt * np.pi
    phi = (np.arange(nph) + 0.5) / nph * 2 * np.pi
    t, ph = np.meshgrid(theta, phi, indexing="ij")
    d = np.stack(
        [np.sin(t) * np.cos(ph), np.sin(t) * np.sin(ph), np.cos(t)], axis=-1
    ).reshape(-1, 3)
    w = (np.sin(t) * (np.pi / nt) * (2 * np.pi / nph)).reshape(-1)
    dirs = jnp.asarray(d, jnp.float32)
    pdf = disney.pdf_specular(p, jnp.broadcast_to(wo, dirs.shape), dirs)
    total = float(jnp.sum(pdf * jnp.asarray(w, jnp.float32)))
    assert abs(total - 1.0) < 0.03, total


@pytest.mark.parametrize("theta_deg", [20.0, 60.0])
def test_specular_mc_consistency(theta_deg):
    """MC estimate of the specular integral with the mixture sampler matches
    quadrature (clearcoat=0 so sampler and pdf agree exactly)."""
    p = _default(roughness=0.45, specular=1.0, metallic=0.5)
    wo = _view(theta_deg)
    dirs, w = _hemi_grid()
    f_ref = disney.eval_specular_cos(p, jnp.broadcast_to(wo, dirs.shape), dirs)
    ref = np.asarray(jnp.sum(f_ref * w[:, None], axis=0))

    n = 400000
    u = jax.random.uniform(rng.stream(7), (n, 2))
    wos = jnp.broadcast_to(wo, (n, 3))
    wi = disney.sample_specular(p, wos, u[:, 0], u[:, 1])
    pdf = disney.pdf_specular(p, wos, wi)
    f = disney.eval_specular_cos(p, wos, wi)
    valid = (wi[:, 2] > 0) & (pdf > 1e-7) & (vm.dot(wi, wi) > 0.5)
    est = np.asarray(
        jnp.mean(jnp.where(valid[:, None], f / pdf[:, None], 0.0), axis=0)
    )
    np.testing.assert_allclose(est, ref, rtol=0.05, atol=5e-3)


def test_diffuse_mc_consistency():
    p = _default(roughness=0.7, subsurface=0.5)
    wo = _view(40.0)
    dirs, w = _hemi_grid()
    f_ref = disney.eval_diffuse_cos(p, jnp.broadcast_to(wo, dirs.shape), dirs)
    ref = np.asarray(jnp.sum(f_ref * w[:, None], axis=0))

    n = 200000
    u = jax.random.uniform(rng.stream(8), (n, 2))
    wos = jnp.broadcast_to(wo, (n, 3))
    wi = disney.sample_diffuse(p, wos, u[:, 0], u[:, 1])
    pdf = disney.pdf_diffuse(p, wos, wi)
    f = disney.eval_diffuse_cos(p, wos, wi)
    est = np.asarray(jnp.mean(f / pdf[:, None], axis=0))
    np.testing.assert_allclose(est, ref, rtol=0.03, atol=1e-3)


def test_diffuse_energy_bound():
    dirs, w = _hemi_grid()
    for rough in (0.0, 0.5, 1.0):
        for ss in (0.0, 1.0):
            p = _default(base_color=jnp.ones(3), roughness=rough, subsurface=ss)
            for theta in (5.0, 45.0, 80.0):
                wo = _view(theta)
                f = disney.eval_diffuse_cos(p, jnp.broadcast_to(wo, dirs.shape), dirs)
                albedo = float(jnp.sum(f[:, 0] * w))
                # The Hanrahan-Krueger flat-SSS term is known to gain energy
                # at grazing angles; bound it loosely as a sanity check.
                assert albedo < 2.0, (rough, ss, theta, albedo)


def test_metallic_kills_diffuse():
    p = _default(metallic=1.0)
    wo = _view(30.0)
    wi = _view(-20.0)
    f = disney.eval_diffuse(p, wo, wi)
    assert float(jnp.max(jnp.abs(f))) == 0.0


def test_specular_f0_remap():
    # metallic=0: F0 = specular*0.08 * white (no tint)
    p = _default(base_color=jnp.array([0.5, 0.5, 0.5]), specular=1.0)
    np.testing.assert_allclose(np.asarray(p.spec_f0), 0.08, atol=1e-6)
    # metallic=1: F0 = base_color
    p = _default(base_color=jnp.array([0.9, 0.6, 0.3]), metallic=1.0)
    np.testing.assert_allclose(np.asarray(p.spec_f0), [0.9, 0.6, 0.3], atol=1e-6)


def test_sheen_adds_grazing_energy():
    p0 = _default(sheen=0.0)
    p1 = _default(sheen=1.0)
    wo = _view(80.0)
    wi = vm.normalize(jnp.array([-0.9, 0.1, 0.25]))
    f0 = float(disney.eval_specular(p0, wo, wi)[0])
    f1 = float(disney.eval_specular(p1, wo, wi)[0])
    assert f1 > f0


def test_clearcoat_lobe_positive_and_gtr1_normalized():
    p = _default(clearcoat=1.0, clearcoat_gloss=0.8, roughness=0.3)
    # GTR1 D integrates to 1 over the hemisphere of half vectors
    dirs, w = _hemi_grid()
    d = disney.d_gtr1(p, dirs[:, 2] ** 2)
    total = float(jnp.sum(d * dirs[:, 2] * w))
    assert abs(total - 1.0) < 0.02, total
