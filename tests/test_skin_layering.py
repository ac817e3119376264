"""rlSkin Fresnel energy layering (rlSkin.cpp:204-238, rlGgx.h:181-184):

    sheenFresnel    = avgF(sheen)    * sheen_weight
    specularFresnel = avgF(specular) * specular_weight
    specular       *= 1 - sheenFresnel
    sssWeight      *= 1 - specularFresnel * (1 - sheenFresnel)

where avgF is the mean sampled Fresnel over the VNDF draws at the view
direction (getAvgReflectWeight)."""
import jax
import jax.numpy as jnp
import numpy as np

from rlshaders_tpu.bsdf import ggx
from rlshaders_tpu.core.vec3 import V3, v3
from rlshaders_tpu.models import dispatch
from rlshaders_tpu.scene.build import MAT_GGX, MAT_SKIN


def _wo(cos_t):
    c = jnp.asarray(cos_t, jnp.float32)
    s = jnp.sqrt(1.0 - c * c)
    return V3(s, jnp.zeros_like(c), c)


def test_avg_fresnel_matches_mc():
    """The fixed quadrature must agree with a large MC estimate of
    E[F(L, M)] over VNDF draws."""
    p = ggx.make_params(np.ones(3), roughness=0.5, ior=1.44)
    for cos_t in (0.9, 0.5, 0.2):
        wo = _wo(jnp.full((1,), cos_t))
        quad = float(ggx.avg_fresnel(p, wo)[0])
        key = jax.random.PRNGKey(7)
        u = jax.random.uniform(key, (4096, 2))
        m = ggx.sample_vndf(
            V3(*(jnp.broadcast_to(c, (4096,)) for c in (wo.x, wo.y, wo.z))),
            p.alpha_x, p.alpha_y, u[:, 0], u[:, 1],
        )
        from rlshaders_tpu.core import vec3
        wi = vec3.reflect(
            V3(*(jnp.broadcast_to(c, (4096,)) for c in (wo.x, wo.y, wo.z))),
            m,
        )
        mc = float(jnp.mean(
            ggx.fresnel_dielectric(wi, m, p.ior_in, p.ior_out)
        ))
        assert abs(quad - mc) < 0.01, (cos_t, quad, mc)


def _skin_matg(n, spec_w=0.6, sheen_w=0.0, mtype=MAT_SKIN):
    ones = jnp.ones((n,), jnp.float32)

    class G:
        pass

    g = G()
    ggx_p = ggx.make_params(np.ones(3), roughness=0.5, ior=1.44)
    ggx2_p = ggx.make_params(np.ones(3), roughness=0.35, ior=1.44)
    b = lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32), (n,))
    one3 = V3(ones, ones, ones)
    ggx_p = ggx_p._replace(spec_color=one3)
    ggx2_p = ggx2_p._replace(spec_color=one3)
    return dispatch.MatG(
        mtype=jnp.full((n,), mtype, jnp.int32),
        diffuse_color=one3 * 0.8,
        diffuse_roughness=b(0.0),
        spec_weight=one3 * spec_w,
        spec_fresnel_mode=jnp.zeros((n,), jnp.int32),
        spec_ksn=b(0.0),
        spec_dist=jnp.zeros((n,), jnp.int32),
        ggx=jax.tree_util.tree_map(
            lambda a: a if hasattr(a, "aos") else b(a), ggx_p),
        ggx2=jax.tree_util.tree_map(
            lambda a: a if hasattr(a, "aos") else b(a), ggx2_p),
        spec2_weight=one3 * sheen_w,
        skin_spec_w=b(spec_w),
        skin_sheen_w=b(sheen_w),
        sheen_layer=ones,
        dsy=None,
        kt_color=one3 * 0.0,
        opacity=one3,
        emission=one3 * 0.0,
        indirect_diffuse_scale=ones,
        indirect_specular_scale=ones,
        sss_color=one3 * 0.9,
        sss_weight=b(1.0),
        sss_dist=one3 * 0.1,
        cavity_fadeout=jnp.ones((n,), bool),
        has_diffuse=jnp.ones((n,), bool),
        has_spec=jnp.ones((n,), bool),
        has_refract=jnp.zeros((n,), bool),
    )


def test_skin_sss_weight_layered():
    n = 3
    m = _skin_matg(n, spec_w=0.6, sheen_w=0.0)
    wo = _wo(jnp.asarray([0.9, 0.5, 0.2], jnp.float32))
    out = dispatch.skin_layer_fields(m, wo)
    f_spec = np.asarray(ggx.avg_fresnel(m.ggx, wo))
    expect = 1.0 - 0.6 * f_spec
    got = np.asarray(out.sss_weight)
    assert np.allclose(got, expect, atol=1e-6)
    # more grazing view -> higher Fresnel -> stronger attenuation
    assert got[2] < got[1] < got[0] < 1.0
    # no sheen -> specular not attenuated
    assert np.allclose(np.asarray(out.sheen_layer), 1.0)
    # the diffuse-ray fallback color is layered by the same factor
    assert np.allclose(
        np.asarray(out.diffuse_color.x),
        np.asarray(m.diffuse_color.x) * expect, atol=1e-6,
    )


def test_skin_sheen_attenuates_specular_and_sss():
    n = 2
    m = _skin_matg(n, spec_w=0.6, sheen_w=0.5)
    wo = _wo(jnp.asarray([0.7, 0.3], jnp.float32))
    out = dispatch.skin_layer_fields(m, wo)
    f_sheen = np.asarray(ggx.avg_fresnel(m.ggx2, wo))
    f_spec = np.asarray(ggx.avg_fresnel(m.ggx, wo))
    sheen_f = np.clip(0.5 * f_sheen, 0, 1)
    assert np.allclose(np.asarray(out.sheen_layer), 1.0 - sheen_f, atol=1e-6)
    assert np.allclose(
        np.asarray(out.sss_weight),
        1.0 - 0.6 * f_spec * (1.0 - sheen_f), atol=1e-6,
    )


def test_non_skin_lanes_unchanged():
    n = 2
    m = _skin_matg(n, spec_w=0.6, sheen_w=0.5, mtype=MAT_GGX)
    wo = _wo(jnp.asarray([0.7, 0.3], jnp.float32))
    # gather zeroes the skin weights for non-skin materials
    m = m._replace(skin_spec_w=jnp.zeros((n,)), skin_sheen_w=jnp.zeros((n,)))
    out = dispatch.skin_layer_fields(m, wo)
    assert np.allclose(np.asarray(out.sss_weight), 1.0)
    assert np.allclose(np.asarray(out.sheen_layer), 1.0)
    assert np.allclose(
        np.asarray(out.diffuse_color.x), np.asarray(m.diffuse_color.x)
    )
