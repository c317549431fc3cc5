"""Scene as a pytree of SoA device arrays.

The reference's pointer-based object graph (Scene -> Primitive -> Shape /
Material / AreaLight, /root/reference/core/Scene.h, core/Primitive.h) is
replaced by flat tables: triangles carry int32 ids into material / light
tables, hit records gather per-hit parameters by id.  NamedTuples of
arrays are native JAX pytrees, so the whole scene jits, shards, and
differentiates as a value.

Differentiable leaves: material table columns (kd, roughness, eta, ...),
light emission, env-map texels.  Geometry (vertices, indices, ids) is
treated as data; gradients w.r.t. vertices flow too but are not the round-1
target.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

# Material kinds (models/materials.py implements their lobe assemblies,
# mirroring /root/reference/materials/*.cpp)
MAT_MATTE = 0
MAT_MIRROR = 1
MAT_GLASS = 2
MAT_METAL = 3
MAT_PLASTIC = 4
MAT_DISNEY = 5

# Light kinds (/root/reference/lights/*)
LIGHT_POINT = 0
LIGHT_SPOT = 1
LIGHT_DISTANT = 2
LIGHT_AREA = 3
LIGHT_INFINITE = 4
LIGHT_SKYBOX = 5


class Geometry(NamedTuple):
    vertices: jnp.ndarray        # (V,3) f32, world space (pre-transformed,
                                 #  like reference TriangleMesh ctor shape/Triangle.h:12-29)
    triangles: jnp.ndarray       # (T,3) i32
    normals: Optional[jnp.ndarray]   # (V,3) shading normals or None
    uvs: Optional[jnp.ndarray]       # (V,2) or None
    tri_mat: jnp.ndarray         # (T,) i32 material id (-1 = null boundary)
    tri_light: jnp.ndarray       # (T,) i32 area-light id or -1
    tri_medium: jnp.ndarray      # (T,2) i32 [inside, outside] medium or -1
    sph_center: jnp.ndarray      # (S,3)
    sph_radius: jnp.ndarray      # (S,)
    sph_mat: jnp.ndarray         # (S,) i32
    sph_light: jnp.ndarray       # (S,) i32
    sph_medium: jnp.ndarray      # (S,2) i32 [inside, outside]


class InstancedGeom(NamedTuple):
    """Instanced base mesh + transform table — the flat-table equivalent of
    the reference's TransformedPrimitive (core/Primitive.h:55,
    core/Primitive.cpp:80-101): one shared object-space mesh, I rows of
    object<->world matrices.  Intersection runs in object space (direction
    unnormalized so t stays world-parameterized, exactly the reference's
    `r.tMax` narrowing); interaction math transforms the hit triangle's
    vertices/normals back to world (Primitive.cpp:95)."""
    verts: jnp.ndarray          # (V,3) f32 object space
    tris: jnp.ndarray           # (T,3) i32
    normals: Optional[jnp.ndarray]   # (V,3) object-space shading normals
    uvs: Optional[jnp.ndarray]       # (V,2)
    tri_mat: jnp.ndarray        # (T,) i32 base material per triangle
    obj_to_world: jnp.ndarray   # (I,4,4)
    world_to_obj: jnp.ndarray   # (I,4,4)
    inst_mat: jnp.ndarray       # (I,) i32 per-instance material override, -1
    bvh: Optional[tuple]        # BVH over the base mesh or None


class MediumTable(NamedTuple):
    """Participating media (core/Medium.h, media/*.cpp).  kind 0 =
    homogeneous; kind 1 = grid density (one shared grid per scene)."""
    kind: jnp.ndarray      # (K,) i32
    sigma_a: jnp.ndarray   # (K,3)
    sigma_s: jnp.ndarray   # (K,3)
    g: jnp.ndarray         # (K,) Henyey-Greenstein asymmetry
    # grid medium (rows with kind==1 share this one grid)
    density: Optional[jnp.ndarray]      # (nz,ny,nx) or None
    world_to_medium: jnp.ndarray        # (K,4,4)
    inv_max_density: jnp.ndarray        # (K,)


class MaterialTable(NamedTuple):
    """One row per material; columns cover the union of the six reference
    material parameter sets (materials/*.cpp).  Unused columns are zero."""
    kind: jnp.ndarray      # (M,) i32
    kd: jnp.ndarray        # (M,3) diffuse / base color
    sigma: jnp.ndarray     # (M,) Oren-Nayar sigma (degrees)
    kr: jnp.ndarray        # (M,3) specular reflect scale
    kt: jnp.ndarray        # (M,3) specular transmit scale
    ks: jnp.ndarray        # (M,3) glossy scale
    eta: jnp.ndarray       # (M,) dielectric IOR
    eta3: jnp.ndarray      # (M,3) conductor eta
    k3: jnp.ndarray        # (M,3) conductor absorption
    rough_u: jnp.ndarray   # (M,)
    rough_v: jnp.ndarray   # (M,)
    remap_rough: jnp.ndarray  # (M,) 1.0 if roughness->alpha remap applies
    kd_tex: jnp.ndarray    # (M,) i32 texture id for kd, or -1
    bump_tex: jnp.ndarray  # (M,) i32 texture id for bump height, or -1
    bump_scale: jnp.ndarray  # (M,) bump height scale
    # Disney 2015 extras (materials/DisneyMaterial.h:17)
    metallic: jnp.ndarray       # (M,)
    spec_trans: jnp.ndarray     # (M,)
    specular_tint: jnp.ndarray  # (M,)
    anisotropic: jnp.ndarray    # (M,)
    sheen: jnp.ndarray          # (M,)
    sheen_tint: jnp.ndarray     # (M,)
    clearcoat: jnp.ndarray      # (M,)
    clearcoat_gloss: jnp.ndarray  # (M,)
    flatness: jnp.ndarray       # (M,)
    diff_trans: jnp.ndarray     # (M,)
    thin: jnp.ndarray           # (M,) 1.0 if thin surface


class LightTable(NamedTuple):
    kind: jnp.ndarray       # (L,) i32
    pos: jnp.ndarray        # (L,3) point/spot world position
    emit: jnp.ndarray       # (L,3) I (point/spot), L (distant/area Lemit)
    axis: jnp.ndarray       # (L,3) spot axis / distant wLight direction
    tri: jnp.ndarray        # (L,) i32 area-light triangle id or -1
    two_sided: jnp.ndarray  # (L,)
    cos_falloff: jnp.ndarray  # (L,) spot cosFalloffStart
    cos_total: jnp.ndarray    # (L,) spot cosTotalWidth
    scale: jnp.ndarray      # (L,) extra radiance scale (skybox 1/10 etc.)


class EnvMap(NamedTuple):
    """Infinite area light env map + importance-sampling CDFs
    (lights/InfiniteAreaLight.cpp:62-121)."""
    image: jnp.ndarray          # (H,W,3) radiance texels
    cond_func: jnp.ndarray      # Distribution2D pieces over the luminance*sin
    cond_cdf: jnp.ndarray
    cond_int: jnp.ndarray
    marg_cdf: jnp.ndarray
    marg_int: jnp.ndarray
    world_to_light: jnp.ndarray  # (4,4)
    light_to_world: jnp.ndarray  # (4,4)
    # optional inverse-CDF jump table for the conditional rows (round 4:
    # bounds the per-lane sampling bisection to 4 gathers; see
    # ops/sampling._build_row_inverse)
    cond_inv: jnp.ndarray = None
    # (H, W, 4) [r, g, b, cond_func/marg_int] packed so the escaped-ray
    # MIS path fetches Le AND the map pdf numerator with ONE per-lane
    # gather (round 5: the two separate gathers + duplicated spherical
    # trig were ~35% of the mesh chunk; models/lights.envmap_le_pdf)
    le_func: jnp.ndarray = None


class Scene(NamedTuple):
    geom: Geometry
    materials: MaterialTable
    lights: LightTable
    env: Optional[EnvMap]
    textures: Optional[jnp.ndarray]  # (K,H,W,3) stacked same-size textures or None
    media: Optional[MediumTable]
    camera_medium: int  # static-ish: medium the camera sits in (-1 vacuum)
    world_center: jnp.ndarray  # (3,)
    world_radius: jnp.ndarray  # ()
    bvh: Optional[tuple]  # BVH arrays (ops/bvh.py) or None -> brute force
    light_dist: Optional[tuple] = None  # spatial light distribution grid
    instanced: Optional[InstancedGeom] = None  # TransformedPrimitive table
    # power-strategy selection pmf, precomputed at build (the reference
    # builds its LightDistribution once in Preprocess,
    # integrators/PathIntegrator.cpp:31 — not per bounce).  Frozen w.r.t.
    # emission updates, which keeps the estimator unbiased (any fixed pmf
    # does) and the selection pdf detached for gradients.
    light_pmf: Optional[jnp.ndarray] = None
    # big-prim separation (ops/bvh.build_bvh subset): global ids of huge
    # triangles kept OUT of the BVH and brute-forced by scene_intersect —
    # a giant ground plane in every BVH node-set union wrecks packet
    # coherence (measured on BASELINE config 4)
    big_tri_idx: Optional[jnp.ndarray] = None

    @property
    def n_lights(self):
        return self.lights.kind.shape[0]


# ---------------------------------------------------------------------------
# Builder
# ---------------------------------------------------------------------------

def _v3(x):
    a = np.asarray(x, np.float32)
    if a.ndim == 0:
        a = np.full(3, float(a), np.float32)
    return a


class SceneBuilder:
    """Accumulates host-side numpy geometry/material/light data, then
    freezes into the Scene pytree.  Plays the role of the reference's
    ui/ModelList.cpp scene-construction helpers."""

    def __init__(self):
        self.vertices = []
        self.triangles = []
        self.normals = []
        self.uvs = []
        self.tri_mat = []
        self.tri_light = []
        self.tri_medium = []
        self.sph = []  # (center, radius, mat, light, medium)
        self.materials = []  # dicts
        self.lights = []  # dicts
        self.media = []  # dicts
        self.textures = []  # host images for the mip atlas
        self.env = None
        self.instanced = None
        self.camera_medium = -1
        self._vtx_count = 0
        self._has_normals = False
        self._has_uvs = False

    # -- media -------------------------------------------------------------

    def add_homogeneous_medium(self, sigma_a, sigma_s, g=0.0):
        """HomogeneousMedium (media/HomogeneousMedium.cpp); the reference
        app instantiates (2.4, 1.4, 0.5) scalars (RenderThread.cpp:107)."""
        self.media.append(dict(kind=0, sigma_a=_v3(sigma_a), sigma_s=_v3(sigma_s),
                               g=float(g), density=None,
                               world_to_medium=np.eye(4, dtype=np.float32)))
        return len(self.media) - 1

    def add_grid_medium(self, density, sigma_a, sigma_s, g=0.0,
                        medium_to_world=None):
        """GridDensityMedium (media/GridDensityMedium.{h,cpp}): density grid
        in [0,1]^3 medium space, sigma_t scaled by trilinear density."""
        if medium_to_world is None:
            medium_to_world = np.eye(4)
        w2m = np.linalg.inv(np.asarray(medium_to_world, np.float64)).astype(np.float32)
        self.media.append(dict(kind=1, sigma_a=_v3(sigma_a), sigma_s=_v3(sigma_s),
                               g=float(g), density=np.asarray(density, np.float32),
                               world_to_medium=w2m))
        return len(self.media) - 1

    # -- materials ---------------------------------------------------------

    def add_material(self, kind, **kw):
        m = dict(
            kind=kind, kd=(0.5, 0.5, 0.5), sigma=0.0, kr=(1.0, 1.0, 1.0),
            kt=(1.0, 1.0, 1.0), ks=(1.0, 1.0, 1.0), eta=1.5,
            eta3=(1.0, 1.0, 1.0), k3=(1.0, 1.0, 1.0), rough_u=0.0,
            rough_v=0.0, remap_rough=1.0, kd_tex=-1, bump_tex=-1,
            bump_scale=1.0,
            metallic=0.0, spec_trans=0.0, specular_tint=0.0, anisotropic=0.0,
            sheen=0.0, sheen_tint=0.5, clearcoat=0.0, clearcoat_gloss=1.0,
            flatness=0.0, diff_trans=1.0, thin=0.0,
        )
        m.update(kw)
        self.materials.append(m)
        return len(self.materials) - 1

    def add_texture(self, image):
        """Register an image texture (ImageTexture, textures/ImageTexture.h);
        returns texture id usable as kd_tex on any material."""
        self.textures.append(np.asarray(image, np.float32))
        return len(self.textures) - 1

    def add_matte(self, kd, sigma=0.0, kd_tex=-1):
        return self.add_material(MAT_MATTE, kd=kd, sigma=sigma, kd_tex=kd_tex)

    def add_mirror(self, kr=(0.9, 0.9, 0.9)):
        return self.add_material(MAT_MIRROR, kr=kr)

    def add_glass(self, kr=(1.0, 1.0, 1.0), kt=(1.0, 1.0, 1.0), eta=1.5,
                  rough_u=0.0, rough_v=0.0):
        return self.add_material(MAT_GLASS, kr=kr, kt=kt, eta=eta,
                                 rough_u=rough_u, rough_v=rough_v)

    # Copper conductor spectrum, CIE-integrated to RGB.  The reference
    # ships 56-sample measured copper n/k curves and a (commented-out)
    # CreateMetalMaterial defaulting eta/k to them
    # (/root/reference/materials/MetalMaterial.cpp:52-102); these are the
    # standard RGBSpectrum conversions of that published data.
    COPPER_ETA = (0.2004, 0.9240, 1.1022)
    COPPER_K = (3.9129, 2.4528, 2.1421)

    def add_metal(self, eta3=None, k3=None, roughness=0.01, remap_rough=1.0):
        """MetalMaterial (materials/MetalMaterial.cpp:28-49): perfect
        microfacet conductor.  eta3/k3 default to copper, matching the
        reference's CreateMetalMaterial defaults; remap_rough mirrors its
        remapRoughness flag (the app's own yellow-metal preset,
        ui/MaterialList.cpp:58-69, passes false)."""
        if eta3 is None:
            eta3 = self.COPPER_ETA
        if k3 is None:
            k3 = self.COPPER_K
        return self.add_material(MAT_METAL, eta3=eta3, k3=k3,
                                 rough_u=roughness, rough_v=roughness,
                                 remap_rough=remap_rough)

    def add_plastic(self, kd, ks=(1.0, 1.0, 1.0), roughness=0.1):
        return self.add_material(MAT_PLASTIC, kd=kd, ks=ks, rough_u=roughness,
                                 rough_v=roughness)

    def add_disney(self, color, **kw):
        return self.add_material(MAT_DISNEY, kd=color, **kw)

    # -- geometry ----------------------------------------------------------

    def add_mesh(self, vertices, triangles, material, light=-1, transform=None,
                 normals=None, uvs=None, medium=(-1, -1)):
        """vertices (V,3), triangles (T,3) int; optional 4x4 transform applied
        host-side (reference TriangleMesh pre-transforms, shape/Triangle.h:12)."""
        v = np.asarray(vertices, np.float64)
        if transform is not None:
            t = np.asarray(transform, np.float64)
            v = v @ t[:3, :3].T + t[:3, 3]
        tri = np.asarray(triangles, np.int64).reshape(-1, 3)
        base = self._vtx_count
        self.vertices.append(v.astype(np.float32))
        self.triangles.append((tri + base).astype(np.int32))
        n = len(tri)
        self.tri_mat.append(np.full(n, material, np.int32))
        self.tri_light.append(np.full(n, light, np.int32))
        self.tri_medium.append(np.tile(np.asarray(medium, np.int32), (n, 1)))
        if normals is not None:
            nr = np.asarray(normals, np.float64)
            if transform is not None:
                t = np.asarray(transform, np.float64)
                inv_t = np.linalg.inv(t[:3, :3]).T
                nr = nr @ inv_t.T
                nr /= np.linalg.norm(nr, axis=1, keepdims=True)
            self.normals.append(nr.astype(np.float32))
            self._has_normals = True
        else:
            self.normals.append(None)
        if uvs is not None:
            self.uvs.append(np.asarray(uvs, np.float32))
            self._has_uvs = True
        else:
            self.uvs.append(None)
        self._vtx_count += len(v)
        first_tri = sum(len(t) for t in self.triangles[:-1])
        return first_tri, n  # triangle id range

    def add_instances(self, vertices, triangles, transforms, material=-1,
                      normals=None, uvs=None, per_instance_material=None,
                      bvh=False):
        """Instanced copies of one base mesh (TransformedPrimitive,
        core/Primitive.cpp:80-101).  `transforms` is (I,4,4) object-to-world
        matrices; `material` is the base material id stamped on every
        triangle (or an array of per-triangle ids);
        `per_instance_material` optionally overrides the material per
        instance (-1 rows fall back to the base).  One instanced mesh per
        scene (matches the reference, which only ever instances one model).
        """
        if self.instanced is not None:
            raise ValueError("one instanced mesh per scene")
        v = np.asarray(vertices, np.float32)
        t = np.asarray(triangles, np.int32).reshape(-1, 3)
        m = np.asarray(transforms, np.float64).reshape(-1, 4, 4)
        tri_mat = (np.full(len(t), material, np.int32)
                   if np.ndim(material) == 0
                   else np.asarray(material, np.int32))
        inst_mat = (np.full(len(m), -1, np.int32)
                    if per_instance_material is None
                    else np.asarray(per_instance_material, np.int32))
        nr = None if normals is None else np.asarray(normals, np.float32)
        uv = None if uvs is None else np.asarray(uvs, np.float32)
        self.instanced = dict(verts=v, tris=t, normals=nr, uvs=uv,
                              tri_mat=tri_mat, o2w=m.astype(np.float32),
                              w2o=np.linalg.inv(m).astype(np.float32),
                              inst_mat=inst_mat, bvh=bvh)
        return len(m)

    def add_sphere(self, center, radius, material, light=-1, medium=(-1, -1)):
        self.sph.append((np.asarray(center, np.float32), float(radius),
                         int(material), int(light), np.asarray(medium, np.int32)))
        return len(self.sph) - 1

    # -- lights ------------------------------------------------------------

    def _light(self, kind, **kw):
        l = dict(kind=kind, pos=(0.0, 0.0, 0.0), emit=(0.0, 0.0, 0.0),
                 axis=(0.0, 0.0, 1.0), tri=-1, two_sided=0.0,
                 cos_falloff=1.0, cos_total=0.0, scale=1.0)
        l.update(kw)
        self.lights.append(l)
        return len(self.lights) - 1

    def add_point_light(self, pos, intensity):
        return self._light(LIGHT_POINT, pos=pos, emit=intensity)

    def add_spot_light(self, pos, axis, intensity, total_width_deg, falloff_start_deg):
        return self._light(
            LIGHT_SPOT, pos=pos, axis=axis, emit=intensity,
            cos_total=float(np.cos(np.deg2rad(total_width_deg))),
            cos_falloff=float(np.cos(np.deg2rad(falloff_start_deg))),
        )

    def add_distant_light(self, w_light, radiance):
        return self._light(LIGHT_DISTANT, axis=w_light, emit=radiance)

    def add_area_light_tri(self, tri_id, l_emit, two_sided=False):
        return self._light(LIGHT_AREA, emit=l_emit, tri=tri_id,
                           two_sided=1.0 if two_sided else 0.0)

    def add_skybox_light(self, scale=1.0):
        """The reference SkyBoxLight with its image-load failure fallback:
        Le = position gradient on the world sphere (SkyBoxLight.cpp:55-87),
        Sample_Li black (no image data). scale kept for completeness."""
        return self._light(LIGHT_SKYBOX, scale=scale)

    def set_environment(self, image, light_to_world=None, scale=1.0):
        self.env = (np.asarray(image, np.float32) * scale, light_to_world)
        return self._light(LIGHT_INFINITE)

    # -- freeze ------------------------------------------------------------

    def build(self, bvh=False):
        from ..ops.sampling import make_distribution2d

        if self.vertices:
            verts = np.concatenate(self.vertices, 0)
            tris = np.concatenate(self.triangles, 0)
            tri_mat = np.concatenate(self.tri_mat, 0)
            tri_light = np.concatenate(self.tri_light, 0)
            tri_medium = np.concatenate(self.tri_medium, 0)
        else:
            verts = np.zeros((3, 3), np.float32)
            tris = np.zeros((1, 3), np.int32)
            tri_mat = np.zeros(1, np.int32)
            tri_light = np.full(1, -1, np.int32)
            tri_medium = np.full((1, 2), -1, np.int32)

        normals = None
        if self._has_normals:
            parts = []
            for i, v in enumerate(self.vertices):
                n = self.normals[i]
                parts.append(n if n is not None else np.zeros_like(v))
            normals = np.concatenate(parts, 0)
        uvs = None
        if self._has_uvs:
            parts = []
            for i, v in enumerate(self.vertices):
                u = self.uvs[i]
                parts.append(u if u is not None else np.zeros((len(v), 2), np.float32))
            uvs = np.concatenate(parts, 0)

        if self.sph:
            sc = np.stack([s[0] for s in self.sph])
            sr = np.asarray([s[1] for s in self.sph], np.float32)
            sm = np.asarray([s[2] for s in self.sph], np.int32)
            sl = np.asarray([s[3] for s in self.sph], np.int32)
            smed = np.stack([s[4] for s in self.sph]).astype(np.int32)
        else:
            sc = np.zeros((0, 3), np.float32)
            sr = np.zeros((0,), np.float32)
            sm = np.zeros((0,), np.int32)
            sl = np.zeros((0,), np.int32)
            smed = np.zeros((0, 2), np.int32)

        geom = Geometry(
            vertices=jnp.asarray(verts), triangles=jnp.asarray(tris),
            normals=None if normals is None else jnp.asarray(normals),
            uvs=None if uvs is None else jnp.asarray(uvs),
            tri_mat=jnp.asarray(tri_mat), tri_light=jnp.asarray(tri_light),
            tri_medium=jnp.asarray(tri_medium),
            sph_center=jnp.asarray(sc), sph_radius=jnp.asarray(sr),
            sph_mat=jnp.asarray(sm), sph_light=jnp.asarray(sl),
            sph_medium=jnp.asarray(smed),
        )

        if not self.materials:
            self.add_matte((0.5, 0.5, 0.5))
        cols = {k: [] for k in MaterialTable._fields}
        for m in self.materials:
            for k in cols:
                cols[k].append(m[k])
        mat = MaterialTable(**{
            k: jnp.asarray(np.asarray(
                v, np.int32 if k in ("kind", "kd_tex", "bump_tex") else np.float32))
            for k, v in cols.items()
        })

        if not self.lights:
            self._light(LIGHT_POINT, emit=(0.0, 0.0, 0.0))
        lcols = {k: [] for k in LightTable._fields}
        for l in self.lights:
            for k in lcols:
                lcols[k].append(l[k])
        lights = LightTable(**{
            k: jnp.asarray(np.asarray(v, np.int32 if k in ("kind", "tri") else np.float32))
            for k, v in lcols.items()
        })

        env = None
        if self.env is not None:
            img, l2w = self.env
            if l2w is None:
                l2w = np.eye(4, dtype=np.float32)
            h, w = img.shape[:2]
            # luminance * sin(theta) importance image, 2x resolution per the
            # reference (InfiniteAreaLight.cpp:62-82) simplified to 1x here
            lum = img @ np.asarray([0.212671, 0.715160, 0.072169], np.float32)
            sin_theta = np.sin(np.pi * (np.arange(h) + 0.5) / h).astype(np.float32)
            d2 = make_distribution2d(jnp.asarray(lum * sin_theta[:, None]))
            lf = np.concatenate(
                [np.asarray(img, np.float32),
                 (np.asarray(d2.cond_func, np.float32)
                  / max(float(d2.marg_int), 1e-20))[..., None]], axis=-1)
            env = EnvMap(
                image=jnp.asarray(img),
                cond_func=d2.cond_func, cond_cdf=d2.cond_cdf, cond_int=d2.cond_int,
                marg_cdf=d2.marg_cdf, marg_int=d2.marg_int,
                world_to_light=jnp.asarray(np.linalg.inv(l2w).astype(np.float32)),
                light_to_world=jnp.asarray(np.asarray(l2w, np.float32)),
                cond_inv=d2.cond_inv,
                le_func=jnp.asarray(lf),
            )

        textures = None
        if self.textures:
            from ..ops.texture import build_texture_atlas

            textures = build_texture_atlas(self.textures)

        media = None
        if self.media:
            grid = None
            inv_max = []
            for m in self.media:
                if m["density"] is not None:
                    grid = m["density"]
                    inv_max.append(1.0 / max(float(grid.max()), 1e-8))
                else:
                    inv_max.append(1.0)
            media = MediumTable(
                kind=jnp.asarray([m["kind"] for m in self.media], jnp.int32),
                sigma_a=jnp.asarray([m["sigma_a"] for m in self.media]),
                sigma_s=jnp.asarray([m["sigma_s"] for m in self.media]),
                g=jnp.asarray([m["g"] for m in self.media], jnp.float32),
                density=None if grid is None else jnp.asarray(grid),
                world_to_medium=jnp.asarray(
                    np.stack([m["world_to_medium"] for m in self.media])),
                inv_max_density=jnp.asarray(inv_max, jnp.float32),
            )

        instanced = None
        if self.instanced is not None:
            ig = self.instanced
            ig_bvh = None
            if ig["bvh"]:
                from ..ops.bvh import build_bvh
                ig_bvh = build_bvh(ig["verts"], ig["tris"])
            instanced = InstancedGeom(
                verts=jnp.asarray(ig["verts"]), tris=jnp.asarray(ig["tris"]),
                normals=None if ig["normals"] is None else jnp.asarray(ig["normals"]),
                uvs=None if ig["uvs"] is None else jnp.asarray(ig["uvs"]),
                tri_mat=jnp.asarray(ig["tri_mat"]),
                obj_to_world=jnp.asarray(ig["o2w"]),
                world_to_obj=jnp.asarray(ig["w2o"]),
                inst_mat=jnp.asarray(ig["inst_mat"]),
                bvh=ig_bvh,
            )

        # world bounds -> bounding sphere (Scene ctor caches worldBound)
        pts = [verts] if len(verts) else []
        if len(sc):
            pts += [sc - sr[:, None], sc + sr[:, None]]
        if self.instanced is not None:
            ig = self.instanced
            vh = np.concatenate([ig["verts"], np.ones((len(ig["verts"]), 1),
                                                      np.float32)], 1)
            for m in ig["o2w"]:
                pts.append((vh @ m.T)[:, :3])
        allp = np.concatenate(pts, 0) if pts else np.zeros((1, 3), np.float32)
        lo, hi = allp.min(0), allp.max(0)
        center = (lo + hi) / 2
        radius = float(np.linalg.norm(hi - center))

        bvh_arrays = None
        if bvh:
            # bvh=True/"sah": host SAH build (C++ builder w/ numpy
            # fallback, BVHAccel.cpp:270-357 cost model) — best-quality
            # tree for static scenes.  bvh="lbvh": on-DEVICE morton
            # build (ops/lbvh.py, mirroring the reference's HLBVH,
            # BVHAccel.cpp:369-460) — lower-quality tree but no host
            # round trip, for interactively edited geometry.
            if bvh == "lbvh":
                from ..ops.lbvh import build_lbvh
                bvh_arrays = build_lbvh(verts, tris)
            else:
                from ..ops.bvh import build_bvh
                big_idx = None
                if len(tris) > 4096:
                    v_np = np.asarray(verts)
                    t_np = np.asarray(tris)
                    e1 = v_np[t_np[:, 1]] - v_np[t_np[:, 0]]
                    e2 = v_np[t_np[:, 2]] - v_np[t_np[:, 0]]
                    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
                    med = np.median(areas[areas > 0]) if (areas > 0).any() else 0
                    big = areas > 1000.0 * max(med, 1e-20)
                    nb = int(big.sum())
                    if 0 < nb <= 64:
                        big_idx = np.nonzero(big)[0]
                if big_idx is not None:
                    bvh_arrays = build_bvh(verts, tris,
                                           subset=np.nonzero(~big)[0])
                else:
                    bvh_arrays = build_bvh(verts, tris)

        scene = Scene(
            geom=geom, materials=mat, lights=lights, env=env, textures=textures,
            media=media, camera_medium=self.camera_medium,
            world_center=jnp.asarray(center, jnp.float32),
            world_radius=jnp.asarray(max(radius, 1e-3), jnp.float32),
            bvh=bvh_arrays,
            light_dist=None,
            instanced=instanced,
            big_tri_idx=(None if (not bvh or bvh == "lbvh" or big_idx is None)
                         else jnp.asarray(big_idx, jnp.int32)),
        )
        from ..models.light_dist import light_powers

        pw = light_powers(scene)
        total = jnp.sum(pw)
        nl = pw.shape[0]
        pmf = jnp.where(total > 0, pw / jnp.maximum(total, 1e-12),
                        jnp.full((nl,), 1.0 / nl))
        return scene._replace(light_pmf=pmf)
