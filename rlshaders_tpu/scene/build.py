"""Scene assembly: parsed .ass nodes -> SoA device tables.

This is the TPU-native replacement for the Arnold node system the reference
plugs into (SURVEY.md section 2.3/2.4): triangulated world-space geometry,
a unified material table covering the plugin shaders (rlGgx/rlDisney/rlSkin)
plus the support nodes the testsuite scenes need (standard, MayaFile
textures, MayaShadingEngine pass-through), light tables (quad/disk/skydome),
the perspective camera, and the global render options (GI depths/samples,
gammas) read the way the reference's ShaderData::update does
(rlGgx.cpp:139-149, rlDisney.cpp:59-73, rlSkin.cpp:51-67).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np

from .ass_parser import Node, parse
from .texture import TextureStack, load_image

# Material type codes
MAT_STANDARD = 0
MAT_GGX = 1
MAT_DISNEY = 2
MAT_SKIN = 3

# Arnold ray-visibility bits (Arnold 4 ai_ray.h convention; scene
# `visibility` masks use exactly these values, e.g. the shared scene's side
# walls carry 253 = everything but SHADOW)
VIS_CAMERA = 1
VIS_SHADOW = 2
VIS_REFLECTED = 4
VIS_REFRACTED = 8
VIS_SUBSURFACE = 16
VIS_DIFFUSE = 32
VIS_GLOSSY = 64


class Geometry(NamedTuple):
    """Triangle soup, world space. All (T, ...) arrays."""

    v0: jnp.ndarray
    e1: jnp.ndarray       # v1 - v0
    e2: jnp.ndarray       # v2 - v0
    n0: jnp.ndarray       # per-corner shading normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray      # (T, 2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    mat_id: jnp.ndarray   # (T,) int32
    mesh_id: jnp.ndarray  # (T,) int32
    visibility: jnp.ndarray  # (T,) int32 ray-visibility bitmask
    opaque: jnp.ndarray   # (T,) bool
    receive_shadows: jnp.ndarray  # (T,) bool


class Materials(NamedTuple):
    """Unified material parameter table, (M, ...) arrays; unused fields hold
    defaults. mtype selects the shading model per material."""

    mtype: jnp.ndarray          # (M,)
    # shared / standard / rlGgx
    kd_color: jnp.ndarray       # (M, 3)
    kd: jnp.ndarray             # (M,)
    kd_tex: jnp.ndarray         # (M,) int32 texture id or -1
    kd_tex_gain: jnp.ndarray    # (M, 3) MayaFile colorGain
    kd_tex_offset: jnp.ndarray  # (M, 3) MayaFile colorOffset
    kd_tex_invs: jnp.ndarray    # (M,) bool: MayaFile `invert` — applied in
    #   STORAGE space before the texture_gamma decode (measured r5: the
    #   goldens' logo glyph diffuse multiplier is (1-c_s)^2.2 + offset
    #   = 1.736, not the linear-space fold's 2 - c_lin = 1.99; the
    #   non-inverted backdrop chain is unaffected, docs/fidelity.md)
    kd_proj: jnp.ndarray        # (M,) 0 = mesh uv, 1 = planar projection
    kd_proj_inv: jnp.ndarray    # (M, 4, 4) inverse placement matrix
    kd_proj_default: jnp.ndarray  # (M, 3) color outside projection coverage
    diffuse_roughness: jnp.ndarray
    ks_color: jnp.ndarray
    ks: jnp.ndarray
    spec_fresnel_mode: jnp.ndarray  # 0 = dielectric IOR (rlGgx), 1 = Schlick
                                    # F0=ksn, 2 = none (F=1); standard shader
                                    # semantics (specular_Fresnel/Ksn)
    spec_ksn: jnp.ndarray
    ks_tex: jnp.ndarray          # (M,) scalar (alpha=luminance) texture or -1
    ks_proj: jnp.ndarray         # (M,) 0 = uv, 1 = planar projection
    ks_proj_inv: jnp.ndarray     # (M, 4, 4)
    bump_tex: jnp.ndarray        # (M,) bump height map or -1
    bump_proj: jnp.ndarray
    bump_proj_inv: jnp.ndarray   # (M, 4, 4)
    bump_height: jnp.ndarray     # (M,)
    spec_roughness: jnp.ndarray
    spec_aniso: jnp.ndarray     # rlGgx anisotropic / standard specular_anisotropy
    spec_dist: jnp.ndarray      # (M,) microfacet NDF: 0 = GGX (rl* shaders),
                                # 1 = Beckmann (standard's default
                                # specular_brdf "cook_torrance")
    glossy_caustics: jnp.ndarray  # (M,) bool: standard's
                                # enable_glossy_caustics — when False the
                                # specular response is killed on DIFFUSE
                                # rays (a specular event on a diffuse path
                                # is a caustic). Plugin shaders (rl*) have
                                # no such gate: always True.
    kt_color: jnp.ndarray
    kt: jnp.ndarray
    ior: jnp.ndarray
    opacity: jnp.ndarray        # (M, 3)
    emission: jnp.ndarray       # (M, 3)
    # rlDisney
    subsurface: jnp.ndarray
    metallic: jnp.ndarray
    specular: jnp.ndarray
    specular_tint: jnp.ndarray
    sheen: jnp.ndarray
    sheen_tint: jnp.ndarray
    clearcoat: jnp.ndarray
    clearcoat_gloss: jnp.ndarray
    indirect_diffuse_scale: jnp.ndarray
    indirect_specular_scale: jnp.ndarray
    # rlSkin
    sss_color: jnp.ndarray      # (M, 3)
    sss_weight: jnp.ndarray
    sss_dist: jnp.ndarray       # (M, 3) scatter distance * multiplier
    cavity_fadeout: jnp.ndarray  # (M,) bool
    skin_spec_color: jnp.ndarray
    skin_spec_weight: jnp.ndarray
    skin_spec_roughness: jnp.ndarray
    skin_spec_ior: jnp.ndarray
    skin_sheen_color: jnp.ndarray
    skin_sheen_weight: jnp.ndarray
    skin_sheen_roughness: jnp.ndarray
    skin_sheen_ior: jnp.ndarray


class QuadLights(NamedTuple):
    """(L, ...) quad area lights; L >= 1 with mask for empty slots."""

    verts: jnp.ndarray      # (L, 4, 3) world space
    radiance: jnp.ndarray   # (L, 3) emitted radiance (normalize/area folded)
    normal: jnp.ndarray     # (L, 3) emission-side normal
    area: jnp.ndarray       # (L,)
    samples: np.ndarray     # host: per-light sample counts n (n^2 samples)
    affect_diffuse: jnp.ndarray
    affect_specular: jnp.ndarray
    diffuse_weight: jnp.ndarray   # (L,) "diffuse" multiplier
    specular_weight: jnp.ndarray
    valid: jnp.ndarray      # (L,) bool


class DiskLights(NamedTuple):
    center: jnp.ndarray     # (L, 3)
    u: jnp.ndarray          # (L, 3) radius-scaled basis
    v: jnp.ndarray
    normal: jnp.ndarray
    radius: jnp.ndarray
    radiance: jnp.ndarray
    area: jnp.ndarray
    samples: np.ndarray
    affect_diffuse: jnp.ndarray
    affect_specular: jnp.ndarray
    valid: jnp.ndarray


class SkyLight(NamedTuple):
    radiance: jnp.ndarray   # (3,)
    samples: int
    affect_diffuse: bool
    affect_specular: bool
    exists: bool
    visible_to_camera: bool


class Camera(NamedTuple):
    c2w: jnp.ndarray        # (4, 4) row-vector convention (rows = basis)
    fov_deg: float
    focus_distance: float
    aperture_size: float
    xres: int
    yres: int


@dataclass
class RenderOptions:
    """Static render configuration (host-side; controls trace shapes)."""

    aa_samples: int = 3
    gi_diffuse_depth: int = 1
    gi_glossy_depth: int = 1
    gi_refraction_depth: int = 6
    gi_total_depth: int = 12
    gi_diffuse_samples: int = 3
    gi_glossy_samples: int = 3
    gi_refraction_samples: int = 3
    gi_sss_samples: int = 3
    xres: int = 256
    yres: int = 256
    texture_gamma: float = 1.0
    light_gamma: float = 1.0
    shader_gamma: float = 1.0
    aa_seed: int = 100
    filter_width: float = 2.0


@dataclass
class Scene:
    geometry: Geometry
    materials: Materials
    quad_lights: QuadLights
    disk_lights: DiskLights
    sky: SkyLight
    camera: Camera
    textures: TextureStack
    options: RenderOptions
    mesh_names: list = field(default_factory=list)
    material_names: list = field(default_factory=list)
    trace_set_names: list = field(default_factory=list)


def _xform_points(pts: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Row-vector transform: p' = p @ M[:3,:3] + M[3,:3]."""
    return pts @ m[:3, :3] + m[3, :3]


def _xform_normals(ns: np.ndarray, m: np.ndarray) -> np.ndarray:
    # row-vector points transform as p' = p @ M, so normals transform as
    # n' = n @ inv(M)^T (preserves n.t = 0 for tangents t' = t @ M)
    out = ns @ np.linalg.inv(m[:3, :3]).T
    norm = np.linalg.norm(out, axis=-1, keepdims=True)
    return out / np.maximum(norm, 1e-20)


def _gamma_rgb(c, gamma: float) -> np.ndarray:
    c = np.asarray(c, np.float32)
    if c.ndim == 0:
        c = np.full(3, float(c), np.float32)
    return np.power(np.maximum(c, 0.0), gamma).astype(np.float32)


def _triangulate(nsides: np.ndarray | int, idxs: np.ndarray):
    """Fan-triangulate polygons; returns (tri_corner_rows, face_of_tri)."""
    if np.isscalar(nsides) or np.ndim(nsides) == 0:
        nsides = np.full(1, int(nsides), np.int32) if int(nsides) > 2 else np.zeros(
            0, np.int32
        )
    nsides = np.asarray(nsides, np.int64)
    offs = np.concatenate([[0], np.cumsum(nsides)])
    tri_rows = []
    for fi, n in enumerate(nsides):
        o = offs[fi]
        for k in range(1, n - 1):
            tri_rows.append((o, o + k, o + k + 1))
    tri_rows = np.asarray(tri_rows, np.int64)
    corner = idxs[tri_rows]  # (T, 3)
    return corner


def build(path_or_nodes, base_dir: str | None = None) -> Scene:
    """Assemble a Scene from an .ass path or pre-parsed node list."""
    if isinstance(path_or_nodes, str):
        nodes = parse(path_or_nodes)
        base_dir = base_dir or os.path.dirname(os.path.abspath(path_or_nodes))
    else:
        nodes = path_or_nodes
        base_dir = base_dir or "."

    by_name: dict[str, Node] = {n.name: n for n in nodes if n.name}
    opts_node = next(n for n in nodes if n.type == "options")

    opts = RenderOptions(
        aa_samples=int(opts_node.get("AA_samples", 1)),
        gi_diffuse_depth=int(opts_node.get("GI_diffuse_depth", 0)),
        gi_glossy_depth=int(opts_node.get("GI_glossy_depth", 0)),
        gi_refraction_depth=int(opts_node.get("GI_refraction_depth", 0)),
        gi_total_depth=int(opts_node.get("GI_total_depth", 0)),
        gi_diffuse_samples=int(opts_node.get("GI_diffuse_samples", 1)),
        gi_glossy_samples=int(opts_node.get("GI_glossy_samples", 1)),
        gi_refraction_samples=int(opts_node.get("GI_refraction_samples", 1)),
        gi_sss_samples=int(opts_node.get("GI_sss_samples", 1)),
        xres=int(opts_node.get("xres", 256)),
        yres=int(opts_node.get("yres", 256)),
        texture_gamma=float(opts_node.get("texture_gamma", 1.0)),
        light_gamma=float(opts_node.get("light_gamma", 1.0)),
        shader_gamma=float(opts_node.get("shader_gamma", 1.0)),
        aa_seed=int(opts_node.get("AA_seed", 0)),
    )

    # Pixel filter: the options `outputs` line names the filter node
    # ("AOV type filter driver", test_geo.ass:12); read its width instead of
    # assuming the default (reference harness scenes use gaussian_filter
    # width 2, but any width must be honored).
    outputs = opts_node.get("outputs", "")
    for tok in (outputs.split() if isinstance(outputs, str) else []):
        fnode = by_name.get(tok)
        if fnode is not None and fnode.type.endswith("_filter"):
            opts.filter_width = float(fnode.get("width", 2.0))
            break

    # ---------------- camera ----------------
    cam_name = opts_node.get("camera")
    cam_node = by_name.get(cam_name) or next(
        n for n in nodes if n.type == "persp_camera"
    )
    camera = Camera(
        c2w=jnp.asarray(cam_node.get("matrix"), jnp.float32),
        fov_deg=float(cam_node.get("fov", 54.43)),
        focus_distance=float(cam_node.get("focus_distance", 1.0)),
        aperture_size=float(cam_node.get("aperture_size", 0.0)),
        xres=opts.xres,
        yres=opts.yres,
    )

    # ---------------- textures + materials ----------------
    tex_paths: list[str] = []
    tex_images: list[np.ndarray] = []

    _no_tex = {
        "tex_id": -1,
        "gain": np.ones(3, np.float32),
        "offset": np.zeros(3, np.float32),
        "invs": False,
        "proj": 0,
        "proj_inv": np.eye(4, dtype=np.float32),
        "proj_default": np.full(3, 0.5, np.float32),
    }

    def _load_texture_slot(fname: str) -> int:
        for root in (
            base_dir,
            os.path.join(base_dir, ".."),
            os.path.join(base_dir, "..", ".."),
            os.path.join(base_dir, "..", "..", "..", "data"),
            os.path.join(base_dir, "..", "..", "data"),
        ):
            p = os.path.join(root, fname)
            if os.path.exists(p):
                p = os.path.abspath(p)
                if p in tex_paths:
                    return tex_paths.index(p)
                tex_paths.append(p)
                # STORAGE space: mips/filter taps average pre-decode values
                # (Arnold/.tx behavior); texture_gamma is applied after
                # filtering in models/dispatch._degamma
                tex_images.append(load_image(p, 1.0))
                return len(tex_paths) - 1
        return -1

    def resolve_tex_input(node_or_name) -> dict:
        """Resolve a MayaFile / MayaProjection link to a texture descriptor:
        tex_id + colorGain/Offset (file-level gain chained under projection-
        level gain) + optional planar projection placement."""
        node = by_name.get(node_or_name) if isinstance(node_or_name, str) else node_or_name
        if node is None:
            return dict(_no_tex)
        if node.type == "MayaProjection":
            inner = resolve_tex_input(node.get("image"))
            pm = np.asarray(
                node.get("placementMatrix", np.eye(4, dtype=np.float32)), np.float32
            ).reshape(4, 4)
            out = dict(inner)
            # proj 1 = planar with defaultColor outside the unit square,
            # proj 2 = planar with `wrap on` (Maya projection wrap: the
            # image tiles outside coverage instead of falling back to
            # defaultColor — the testsuite's SA_logo projections rely on
            # this at the logo disc's rim)
            out["proj"] = 2 if bool(node.get("wrap", True)) else 1
            # Maya's place3dTexture feeds its worldInverseMatrix into
            # projection nodes: placementMatrix already maps world -> local
            full = np.eye(4, dtype=np.float32)
            full[:3, :3] = pm[:3, :3]
            full[3, :3] = pm[3, :3]
            out["proj_inv"] = full
            out["proj_default"] = _gamma_rgb(node.get("defaultColor", 0.5), opts.texture_gamma)
            # projection-level gain/offset chain on top of the file's
            g = _gamma_rgb(node.get("colorGain", 1.0), 1.0)
            o = _gamma_rgb(node.get("colorOffset", 0.0), 1.0)
            out["gain"] = out["gain"] * g
            out["offset"] = out["offset"] * g + o
            return out
        if node.type != "MayaFile":
            return dict(_no_tex)
        tex_id = _load_texture_slot(node.get("filename", ""))
        # Maya file node color balance: color = decode(inv(tex)) * colorGain
        # + colorOffset. `invert` (1 - tex) applies in STORAGE space BEFORE
        # the texture_gamma decode — measured against the goldens (r5): the
        # logo glyph's diffuse multiplier is (1 - c_storage)^2.2 + 1 =
        # 1.736, not the linear-space fold's 2 - c_linear = 1.99 (which
        # overshot the glyph +15%) nor a clamped 1.0 (-45%). Gain/offset
        # then apply in linear space (the non-inverted backdrop chain,
        # calibrated in r2, is unchanged).
        gain = _gamma_rgb(node.get("colorGain", 1.0), 1.0)
        offset = _gamma_rgb(node.get("colorOffset", 0.0), 1.0)
        return {
            "tex_id": tex_id,
            "gain": gain,
            "offset": offset,
            "invs": bool(node.get("invert", False)),
            "proj": 0,
            "proj_inv": np.eye(4, dtype=np.float32),
            "proj_default": np.full(3, 0.5, np.float32),
        }

    def resolve_surface(shader_name: str):
        """MayaShadingEngine/bump3d indirection -> (surface shader, bump3d)."""
        node = by_name.get(shader_name)
        bump = None
        for _ in range(4):
            if node is None:
                return None, bump
            if node.type == "MayaShadingEngine":
                node = by_name.get(node.get("beauty", ""))
            elif node.type == "bump3d":
                bump = node
                node = by_name.get(node.get("shader", ""))
            else:
                return node, bump
        return node, bump

    def color_or_tex(v, gamma):
        """A color param may be an RGB value or a link to a texture node.
        Returns (constant_color, tex_descriptor)."""
        if isinstance(v, str):
            return np.ones(3, np.float32), resolve_tex_input(v)
        return _gamma_rgb(v, gamma), dict(_no_tex)

    def scalar_or_link(v, default=0.0):
        """Scalar param possibly linked to a texture alpha ('node.a'):
        returns (value, tex_descriptor). Maya file nodes expose LUMINANCE as
        the alpha of alpha-less images, so '.a' links sample the texture's
        luminance; outside a projection's coverage the alpha is 0."""
        if isinstance(v, str):
            desc = resolve_tex_input(v.split(".")[0])
            return 1.0, desc
        val = float(v) if isinstance(v, (int, float)) else default
        return val, dict(_no_tex)

    def fnum(v, default=0.0):
        return float(v) if isinstance(v, (int, float)) else default

    mat_rows: list[dict] = []
    mat_index: dict[str, int] = {}
    material_names: list[str] = []

    def material_id_for(shader_name: str) -> int:
        if shader_name in mat_index:
            return mat_index[shader_name]
        node, bump_node = resolve_surface(shader_name)
        g = opts.shader_gamma
        row: dict[str, Any] = {
            "mtype": MAT_STANDARD,
            "kd_color": np.ones(3, np.float32), "kd": 0.0, "kd_tex": -1,
            "kd_tex_gain": np.ones(3, np.float32),
            "kd_tex_offset": np.zeros(3, np.float32),
            "kd_tex_invs": False,
            "kd_proj": 0, "kd_proj_inv": np.eye(4, dtype=np.float32),
            "kd_proj_default": np.full(3, 0.5, np.float32),
            "diffuse_roughness": 0.0,
            "ks_color": np.ones(3, np.float32), "ks": 0.0,
            "spec_fresnel_mode": 0, "spec_ksn": 0.04,
            "ks_tex": -1, "ks_proj": 0,
            "ks_proj_inv": np.eye(4, dtype=np.float32),
            "bump_tex": -1, "bump_proj": 0,
            "bump_proj_inv": np.eye(4, dtype=np.float32), "bump_height": 0.0,
            "spec_roughness": 0.4, "spec_aniso": 0.0, "spec_dist": 0,
            "glossy_caustics": True,
            "kt_color": np.ones(3, np.float32), "kt": 0.0, "ior": 1.0,
            "opacity": np.ones(3, np.float32), "emission": np.zeros(3, np.float32),
            "subsurface": 0.0, "metallic": 0.0, "specular": 0.0,
            "specular_tint": 0.0, "sheen": 0.0, "sheen_tint": 0.0,
            "clearcoat": 0.0, "clearcoat_gloss": 0.0,
            "indirect_diffuse_scale": 1.0, "indirect_specular_scale": 1.0,
            "sss_color": np.ones(3, np.float32), "sss_weight": 0.0,
            "sss_dist": np.ones(3, np.float32), "cavity_fadeout": True,
            "skin_spec_color": np.ones(3, np.float32), "skin_spec_weight": 0.0,
            "skin_spec_roughness": 0.5, "skin_spec_ior": 1.44,
            "skin_sheen_color": np.ones(3, np.float32), "skin_sheen_weight": 0.0,
            "skin_sheen_roughness": 0.35, "skin_sheen_ior": 1.44,
        }
        if node is not None and node.type == "rlGgx":
            kd_c, kd_t = color_or_tex(node.get("KdColor", 1.0), g)
            row.update(
                mtype=MAT_GGX,
                kd_color=kd_c, kd_tex=kd_t["tex_id"], kd_tex_gain=kd_t["gain"],
                kd_tex_invs=kd_t["invs"],
                kd_tex_offset=kd_t["offset"], kd_proj=kd_t["proj"],
                kd_proj_inv=kd_t["proj_inv"], kd_proj_default=kd_t["proj_default"],
                kd=fnum(node.get("Kd", 0.5)),
                diffuse_roughness=fnum(node.get("diffuseRoughness", 0.0)),
                ks_color=_gamma_rgb(node.get("KsColor", 1.0), g),
                ks=fnum(node.get("Ks", 0.5)),
                spec_roughness=fnum(node.get("specularRoughness", 0.0)),
                spec_aniso=fnum(node.get("anisotropic", 0.0)),
                kt_color=_gamma_rgb(node.get("KtColor", 1.0), g),
                kt=fnum(node.get("Kt", 0.0)),
                ior=fnum(node.get("ior", 1.0), 1.0),
                opacity=fnum(node.get("opacity", 1.0))
                * _gamma_rgb(node.get("opacity_color", 1.0), 1.0),
            )
        elif node is not None and node.type == "rlDisney":
            base_c, kd_t = color_or_tex(node.get("base_color", 1.0), g)
            row.update(
                mtype=MAT_DISNEY,
                kd_color=base_c, kd_tex=kd_t["tex_id"], kd_tex_gain=kd_t["gain"],
                kd_tex_invs=kd_t["invs"],
                kd_tex_offset=kd_t["offset"], kd_proj=kd_t["proj"],
                kd_proj_inv=kd_t["proj_inv"], kd_proj_default=kd_t["proj_default"],
                subsurface=fnum(node.get("subsurface", 0.0)),
                metallic=fnum(node.get("metallic", 0.0)),
                specular=fnum(node.get("specular", 0.0)),
                specular_tint=fnum(node.get("specular_tint", 0.0)),
                spec_roughness=fnum(node.get("roughness", 0.0)),
                spec_aniso=fnum(node.get("anisotropic", 0.0)),
                sheen=fnum(node.get("sheen", 0.0)),
                sheen_tint=fnum(node.get("sheen_tint", 0.0)),
                clearcoat=fnum(node.get("clearcoat", 0.0)),
                clearcoat_gloss=fnum(node.get("clearcoat_gloss", 0.0)),
                indirect_diffuse_scale=fnum(node.get("indirectDiffuseScale", 1.0), 1.0),
                indirect_specular_scale=fnum(node.get("indirectSpecularScale", 1.0), 1.0),
                opacity=_gamma_rgb(node.get("opacity", 1.0), 1.0),
            )
        elif node is not None and node.type == "rlSkin":
            # sss/specular/sheen colors carry always_linear metadata -> no gamma
            row.update(
                mtype=MAT_SKIN,
                sss_color=_gamma_rgb(node.get("sss_color", 1.0), 1.0),
                sss_weight=fnum(node.get("sss_weight", 1.0), 1.0),
                sss_dist=fnum(node.get("sss_dist_multiplier", 1.0), 1.0)
                * np.asarray(node.get("sss_scatter_dist", np.ones(3)), np.float32),
                cavity_fadeout=bool(node.get("sss_cavity_fadeout", True)),
                skin_spec_color=_gamma_rgb(node.get("specular_color", 1.0), 1.0),
                skin_spec_weight=fnum(node.get("specular_weight", 0.6)),
                skin_spec_roughness=fnum(node.get("specular_roughness", 0.5)),
                skin_spec_ior=fnum(node.get("specular_ior", 1.44), 1.44),
                skin_sheen_color=_gamma_rgb(node.get("sheen_color", 1.0), 1.0),
                skin_sheen_weight=fnum(node.get("sheen_weight", 0.0)),
                skin_sheen_roughness=fnum(node.get("sheen_roughness", 0.35)),
                skin_sheen_ior=fnum(node.get("sheen_ior", 1.44), 1.44),
                opacity=fnum(node.get("opacity", 1.0))
                * _gamma_rgb(node.get("opacity_color", 1.0), 1.0),
            )
        elif node is not None and node.type == "standard":
            kd_c, kd_t = color_or_tex(node.get("Kd_color", 1.0), g)
            # Ks '.a' links: Arnold's MayaFile exposes alpha 0 for alpha-less
            # JPEGs on the scalar path (goldens show no specular on the logo
            # disc), while bump3d's bump_map '.a' path falls back to
            # luminance (the embossed glyph IS in the goldens).
            ks_raw = node.get("Ks", 0.0)
            if isinstance(ks_raw, str):
                ks_val, ks_t = 0.0, dict(_no_tex)
            else:
                ks_val, ks_t = scalar_or_link(ks_raw)
            emis = fnum(node.get("emission", 0.0)) * _gamma_rgb(
                node.get("emission_color", 1.0), g
            )
            row.update(
                mtype=MAT_STANDARD,
                kd_color=kd_c, kd_tex=kd_t["tex_id"], kd_tex_gain=kd_t["gain"],
                kd_tex_invs=kd_t["invs"],
                kd_tex_offset=kd_t["offset"], kd_proj=kd_t["proj"],
                kd_proj_inv=kd_t["proj_inv"], kd_proj_default=kd_t["proj_default"],
                kd=fnum(node.get("Kd", 0.7)),
                # Arnold's standard shader maps diffuse_roughness onto a
                # stronger effective Oren-Nayar sigma than the raw [0,1]
                # parameter (calibrated against the golden floor's
                # near-vs-grazing brightness profile; RLS_STD_ON_SCALE
                # overrides for calibration runs)
                diffuse_roughness=fnum(node.get("diffuse_roughness", 0.0))
                * float(os.environ.get("RLS_STD_ON_SCALE", "1.0")),
                ks_color=color_or_tex(node.get("Ks_color", 1.0), g)[0],
                ks=ks_val,
                ks_tex=ks_t["tex_id"], ks_proj=ks_t["proj"],
                ks_proj_inv=ks_t["proj_inv"],
                spec_fresnel_mode=1 if bool(node.get("specular_Fresnel", False)) else 2,
                spec_ksn=scalar_or_link(node.get("Ksn", 0.0))[0],
                spec_roughness=fnum(node.get("specular_roughness", 0.47)),
                spec_aniso=0.0,
                # Arnold standard's default specular_brdf is cook_torrance
                # (Beckmann); stretched_phong/ward_duer also approximate to
                # Beckmann here (none of the testsuite scenes set them)
                spec_dist=0 if node.get("specular_brdf") == "ggx" else 1,
                # Arnold 4 standard defaults glossy caustics OFF
                glossy_caustics=bool(node.get("enable_glossy_caustics",
                                              False)),
                ior=1.0,
                emission=emis,
                opacity=_gamma_rgb(node.get("opacity", 1.0), 1.0),
                # Arnold standard SSS lobe: Ksss * Ksss_color * BSSRDF with
                # per-channel sss_radius; rides the same diffusion-profile
                # probe stage as rlSkin (integrator/sss.py)
                sss_weight=fnum(node.get("Ksss", 0.0)),
                sss_color=_gamma_rgb(node.get("Ksss_color", 1.0), g),
                sss_dist=np.asarray(
                    node.get("sss_radius", [0.1, 0.1, 0.1]), np.float32
                ).reshape(3),
                cavity_fadeout=False,
            )
        if bump_node is not None:
            bmap = bump_node.get("bump_map")
            if isinstance(bmap, str):
                bt = resolve_tex_input(bmap.split(".")[0])
                row.update(
                    bump_tex=bt["tex_id"], bump_proj=bt["proj"],
                    bump_proj_inv=bt["proj_inv"],
                    bump_height=fnum(bump_node.get("bump_height", 0.0)),
                )
        mat_rows.append(row)
        mat_index[shader_name] = len(mat_rows) - 1
        material_names.append(shader_name)
        return mat_index[shader_name]

    # ---------------- geometry ----------------
    V0, E1, E2, N0, N1, N2, UV0, UV1, UV2 = ([] for _ in range(9))
    MATID, MESHID, VIS, OPQ, RCV = ([] for _ in range(5))
    mesh_names = []
    trace_set_names: list[str] = []

    for n in nodes:
        if n.type != "polymesh":
            continue
        mid = len(mesh_names)
        mesh_names.append(n.name)
        m = np.asarray(n.get("matrix", np.eye(4, dtype=np.float32)), np.float32)
        vlist = np.asarray(n.get("vlist"), np.float32).reshape(-1, 3)
        vidxs = np.asarray(n.get("vidxs"), np.int64).reshape(-1)
        nsides = n.get("nsides", 4)
        corner = _triangulate(nsides, vidxs)  # (T, 3) vertex ids
        vw = _xform_points(vlist, m)
        p0, p1, p2 = vw[corner[:, 0]], vw[corner[:, 1]], vw[corner[:, 2]]

        nlist = n.get("nlist")
        nidxs = n.get("nidxs")
        if nlist is not None and nidxs is not None:
            nlist = np.asarray(nlist, np.float32).reshape(-1, 3)
            nidxs = np.asarray(nidxs, np.int64).reshape(-1)
            ncorner = _triangulate(nsides, nidxs)
            nw = _xform_normals(nlist, m)
            nn0, nn1, nn2 = nw[ncorner[:, 0]], nw[ncorner[:, 1]], nw[ncorner[:, 2]]
        else:
            gn = np.cross(p1 - p0, p2 - p0)
            gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
            nn0 = nn1 = nn2 = gn

        uvlist = n.get("uvlist")
        uvidxs = n.get("uvidxs")
        if uvlist is not None and uvidxs is not None:
            uvlist = np.asarray(uvlist, np.float32).reshape(-1, 2)
            uvidxs = np.asarray(uvidxs, np.int64).reshape(-1)
            uvcorner = _triangulate(nsides, uvidxs)
            u0, u1, u2 = (
                uvlist[uvcorner[:, 0]],
                uvlist[uvcorner[:, 1]],
                uvlist[uvcorner[:, 2]],
            )
        else:
            u0 = u1 = u2 = np.zeros((corner.shape[0], 2), np.float32)

        t = corner.shape[0]
        mat = material_id_for(n.get("shader", ""))
        V0.append(p0); E1.append(p1 - p0); E2.append(p2 - p0)
        N0.append(nn0); N1.append(nn1); N2.append(nn2)
        UV0.append(u0); UV1.append(u1); UV2.append(u2)
        MATID.append(np.full(t, mat, np.int32))
        MESHID.append(np.full(t, mid, np.int32))
        # trace sets (Arnold AiShaderGlobalsSetTraceSet, consumed by the
        # reference's probe confinement — rlSss.h:213-218): per-mesh set
        # names fold into visibility bits 8.. (the ray-visibility masks all
        # fit in bits 0..7); queries use subset accels (accel/trace.py).
        ts = n.get("trace_sets")
        set_bits = 0
        if ts:
            for name in ([ts] if isinstance(ts, str) else list(ts)):
                if name not in trace_set_names:
                    trace_set_names.append(name)
                set_bits |= 1 << (8 + trace_set_names.index(name))
        VIS.append(np.full(
            t, int(n.get("visibility", 255)) | set_bits, np.int32))
        OPQ.append(np.full(t, bool(n.get("opaque", True))))
        RCV.append(np.full(t, bool(n.get("receive_shadows", True))))

    cat = lambda xs: np.concatenate(xs, axis=0)
    # Effective shadow opacity: Arnold's `opaque off` means "evaluate the
    # shader's opacity for shadow rays" — for a material with Kt = 0 and
    # opacity = 1 (every rl* test shader: rlGgx.cpp:264-269 yields
    # out_opacity = 1) the mesh still FULLY blocks. Bake that here so the
    # any-hit shadow kernel treats such meshes as blockers; scenes with real
    # transmission/opacity use the transparent-shadow march instead.
    matid_all = cat(MATID)
    opq_flag = cat(OPQ)
    kt_m = np.asarray([float(r["kt"]) for r in mat_rows], np.float32)
    op_m = np.asarray(
        [float(np.min(r["opacity"])) for r in mat_rows], np.float32
    )
    mat_blocks = (kt_m[matid_all] <= 1e-5) & (op_m[matid_all] >= 1.0 - 1e-5)
    opq_eff = opq_flag | mat_blocks
    # Pad every per-triangle table to a power-of-two bucket (min 128) with
    # inert rows (degenerate position, visibility 0 — rejected by both trace
    # backends before any shading). Per-tri array SHAPES are traced-operand
    # shapes of every fused program, so without bucketing each scene size
    # pays the full ~650-750 s TPU compile (docs/perf.md): with it, e.g.
    # testsuite 0009 (242 tris) and 0010 (200 tris) share one shape class.
    n_real = cat(MATID).shape[0]
    # floor 512: merges every small scene (unit tests, the 0009/0010 skin
    # pair at 400/200 tris) into one shape class for trivial memory
    n_pad = max(512, 1 << int(np.ceil(np.log2(max(n_real, 1)))))
    pad = n_pad - n_real

    def padded(a, fill=0.0):
        a = cat(a) if isinstance(a, list) else a
        if pad == 0:
            return jnp.asarray(a)
        width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.asarray(np.pad(a, width, constant_values=fill))

    geometry = Geometry(
        v0=padded(V0), e1=padded(E1), e2=padded(E2),
        n0=padded(N0, 1.0), n1=padded(N1, 1.0), n2=padded(N2, 1.0),
        uv0=padded(UV0), uv1=padded(UV1), uv2=padded(UV2),
        mat_id=padded(MATID), mesh_id=padded(MESHID, -1),
        visibility=padded(VIS, 0), opaque=padded(opq_eff, False),
        receive_shadows=padded(cat(RCV), True),
    )

    materials = Materials(
        **{
            f: jnp.asarray(
                np.stack([np.asarray(r[f]) for r in mat_rows])
                if np.ndim(mat_rows[0][f]) > 0
                else np.asarray([r[f] for r in mat_rows])
            )
            for f in Materials._fields
        }
    )

    # ---------------- lights ----------------
    lg = opts.light_gamma

    def light_radiance(n: Node, area: float) -> np.ndarray:
        c = _gamma_rgb(n.get("color", 1.0), lg)
        rad = c * float(n.get("intensity", 1.0)) * (2.0 ** float(n.get("exposure", 0.0)))
        if bool(n.get("normalize", True)) and area > 0:
            rad = rad / area
        return rad.astype(np.float32)

    qv, qr, qn, qa, qs, qad, qas, qdw, qsw = ([] for _ in range(9))
    for n in nodes:
        if n.type != "quad_light":
            continue
        m = np.asarray(n.get("matrix"), np.float32)
        verts_local = np.asarray(n.get("vertices"), np.float32).reshape(4, 3)
        verts = _xform_points(verts_local, m)
        e1 = verts[1] - verts[0]
        e2 = verts[3] - verts[0]
        area = float(np.linalg.norm(np.cross(e1, e2)))  # parallelogram quad
        nrm = np.cross(e1, e2)
        nrm /= max(np.linalg.norm(nrm), 1e-20)
        qv.append(verts)
        qa.append(area)
        qn.append(nrm)
        qr.append(light_radiance(n, area))
        qs.append(int(n.get("samples", 1)))
        qad.append(bool(n.get("affect_diffuse", True)))
        qas.append(bool(n.get("affect_specular", True)))
        qdw.append(float(n.get("diffuse", 1.0)))
        qsw.append(float(n.get("specular", 1.0)))

    nq = max(len(qv), 1)
    if not qv:
        qv = [np.zeros((4, 3), np.float32)]
        qr = [np.zeros(3, np.float32)]
        qn = [np.array([0, 0, 1], np.float32)]
        qa = [1.0]; qs = [1]; qad = [False]; qas = [False]; qdw = [0.0]; qsw = [0.0]
    quad_lights = QuadLights(
        verts=jnp.asarray(np.stack(qv)), radiance=jnp.asarray(np.stack(qr)),
        normal=jnp.asarray(np.stack(qn)), area=jnp.asarray(np.asarray(qa, np.float32)),
        samples=np.asarray(qs, np.int32),
        affect_diffuse=jnp.asarray(qad), affect_specular=jnp.asarray(qas),
        diffuse_weight=jnp.asarray(np.asarray(qdw, np.float32)),
        specular_weight=jnp.asarray(np.asarray(qsw, np.float32)),
        valid=jnp.asarray([len(qv) > 0] * nq) if qv else jnp.zeros(nq, bool),
    )
    # fix valid mask for the padded empty case
    if len(qv) == 1 and float(np.sum(np.stack(qr))) == 0.0:
        quad_lights = quad_lights._replace(valid=jnp.zeros(1, bool))

    dc, du, dv, dn, drad, dr, da, ds, dad, das = ([] for _ in range(10))
    for n in nodes:
        if n.type != "disk_light":
            continue
        m = np.asarray(n.get("matrix"), np.float32)
        radius = float(n.get("radius", 0.5))
        center = m[3, :3].copy()
        # MtoA writes the light's scale INTO the matrix and mirrors it in
        # `radius`; applying both doubles the scale (golden 0008's light has
        # radius 1.453 AND matrix rows of length 1.453 — treating them as
        # cumulative renders the light 4.5x too large in area and ~2x too
        # bright). Use the matrix scale when present, else the radius.
        row_scale = float(np.linalg.norm(m[0, :3]))
        k = 1.0 if row_scale > 1e-6 and abs(row_scale - 1.0) > 1e-4 else radius
        u = m[0, :3] * k
        v = m[1, :3] * k
        nrm = -m[2, :3] / max(np.linalg.norm(m[2, :3]), 1e-20)
        area = float(np.pi * np.linalg.norm(np.cross(u, v)))
        dc.append(center); du.append(u); dv.append(v); dn.append(nrm)
        dr.append(radius); da.append(area)
        drad.append(light_radiance(n, area))
        ds.append(int(n.get("samples", 1)))
        dad.append(bool(n.get("affect_diffuse", True)))
        das.append(bool(n.get("affect_specular", True)))
    nd = max(len(dc), 1)
    if not dc:
        dc = [np.zeros(3, np.float32)]; du = [np.array([1, 0, 0], np.float32)]
        dv = [np.array([0, 1, 0], np.float32)]; dn = [np.array([0, 0, 1], np.float32)]
        dr = [1.0]; da = [1.0]; drad = [np.zeros(3, np.float32)]; ds = [1]
        dad = [False]; das = [False]
    disk_lights = DiskLights(
        center=jnp.asarray(np.stack(dc)), u=jnp.asarray(np.stack(du)),
        v=jnp.asarray(np.stack(dv)), normal=jnp.asarray(np.stack(dn)),
        radius=jnp.asarray(np.asarray(dr, np.float32)),
        radiance=jnp.asarray(np.stack(drad)),
        area=jnp.asarray(np.asarray(da, np.float32)),
        samples=np.asarray(ds, np.int32),
        affect_diffuse=jnp.asarray(dad), affect_specular=jnp.asarray(das),
        valid=jnp.asarray([bool(np.any(r > 0)) for r in drad]),
    )

    sky_node = next((n for n in nodes if n.type == "skydome_light"), None)
    if sky_node is not None:
        sky = SkyLight(
            radiance=jnp.asarray(light_radiance(sky_node, 0.0)),
            samples=int(sky_node.get("samples", 1)),
            affect_diffuse=bool(sky_node.get("affect_diffuse", True)),
            affect_specular=bool(sky_node.get("affect_specular", True)),
            exists=True,
            visible_to_camera=True,
        )
    else:
        sky = SkyLight(
            radiance=jnp.zeros(3, jnp.float32), samples=1,
            affect_diffuse=False, affect_specular=False,
            exists=False, visible_to_camera=False,
        )

    return Scene(
        geometry=geometry,
        materials=materials,
        quad_lights=quad_lights,
        disk_lights=disk_lights,
        sky=sky,
        camera=camera,
        textures=TextureStack.build(tex_images),
        options=opts,
        mesh_names=mesh_names,
        material_names=material_names,
        trace_set_names=trace_set_names,
    )
