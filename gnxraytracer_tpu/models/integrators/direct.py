"""Wavefront DirectLighting integrator.

Equivalent of the reference DirectLightingIntegrator
(/root/reference/integrators/DirectLightingIntegrator.cpp:13-64):
single-bounce direct illumination via EstimateDirect (with MIS), with
specular recursion up to maxDepth.  Two strategies like the reference:
UniformSampleAll (every light, one sample each) and UniformSampleOne.

Dimension layout per depth: strategy "one": 1 (select) + 2 + 2 MIS dims +
2 specular continuation = 7; strategy "all": n_lights * 4 + 2.
"""

import jax
import jax.numpy as jnp

from ...constants import INFINITY
from ...ops import samplers, trace
from ...scene import camera as cam_mod
from .. import lights as lights_mod
from .. import materials as mat_mod
from .path import CAMERA_DIMS, RenderCfg, _choose_light, estimate_direct, make_config  # noqa: F401


def trace_paths(scene, cfg: RenderCfg, sampler, pixel, sample, o, d,
                strategy="one"):
    n = o.shape[0]
    if strategy == "one":
        dims_per_depth = 7
    else:
        dims_per_depth = 4 * cfg.n_lights + 2

    n_dims = CAMERA_DIMS + dims_per_depth * cfg.max_depth
    U = samplers.sample_all_dims(sampler, pixel, sample, n_dims)
    state = dict(
        o=o, d=d,
        beta=jnp.ones((n, 3), jnp.float32),
        L=jnp.zeros((n, 3), jnp.float32),
        alive=jnp.ones((n,), bool),
    )

    def depth_step(b, state):
        base = CAMERA_DIMS + b * dims_per_depth
        ub = jax.lax.dynamic_slice(U, (jnp.int32(0), base), (n, dims_per_depth))
        hit = trace.scene_intersect(scene, cfg, state["o"], state["d"],
                                    jnp.full((n,), INFINITY))
        it = trace.make_interaction(scene, cfg, state["o"], state["d"], hit)
        L = state["L"]

        if cfg.has_area:
            is_emitter = hit.hit & (it.light >= 0)
            le = lights_mod.area_light_emitted(
                scene, jnp.maximum(it.light, 0), it.ng, -state["d"],
                cfg.reference_area_bug)
            L = L + jnp.where((state["alive"] & is_emitter)[..., None],
                              state["beta"] * le, 0.0)
        if cfg.has_skybox or cfg.has_env:
            esc = state["alive"] & ~hit.hit
            le_inf = lights_mod.escaped_radiance(scene, cfg, state["o"], state["d"])
            L = L + jnp.where(esc[..., None], state["beta"] * le_inf, 0.0)

        alive = state["alive"] & hit.hit
        wo_local = trace.to_local(it, it.wo)
        has_ns = mat_mod.has_nonspecular(scene.materials, it.mat, cfg)

        if strategy == "one":
            u_sel = ub[:, 0]
            u_light = ub[:, 1:3]
            u_scat = ub[:, 3:5]
            lidx, lpdf = _choose_light(scene, cfg, u_sel)
            ld = estimate_direct(scene, cfg, it, wo_local, u_light, u_scat, lidx)
            L = L + jnp.where((alive & has_ns)[..., None],
                              state["beta"] * ld / lpdf[..., None], 0.0)
            spec_off = 5
        else:
            for li in range(cfg.n_lights):
                u_light = ub[:, 4 * li: 4 * li + 2]
                u_scat = ub[:, 4 * li + 2: 4 * li + 4]
                lidx = jnp.full((n,), li, jnp.int32)
                ld = estimate_direct(scene, cfg, it, wo_local, u_light, u_scat, lidx)
                L = L + jnp.where((alive & has_ns)[..., None], state["beta"] * ld, 0.0)
            spec_off = 4 * cfg.n_lights

        u_s = ub[:, spec_off: spec_off + 2]
        smp = mat_mod.sample(scene.materials, it.mat, cfg, wo_local, u_s, u_s[..., 0])
        continue_spec = alive & smp.specular & smp.valid & (b + 1 < cfg.max_depth)
        beta = state["beta"] * smp.weight
        wi_world = trace.to_world(it, smp.wi)
        no, nd = trace.spawn_ray(it, wi_world)
        return dict(
            o=jnp.where(continue_spec[..., None], no, state["o"]),
            d=jnp.where(continue_spec[..., None], nd, state["d"]),
            beta=jnp.where(continue_spec[..., None], beta, state["beta"]),
            L=L,
            alive=continue_spec,
        )

    state = jax.lax.fori_loop(0, cfg.max_depth, depth_step, state)
    return state["L"]


def render_chunk(scene, camera, sampler, cfg, sample_start, n_samples,
                 strategy="one"):
    hw = cfg.width * cfg.height
    pixel = jnp.tile(jnp.arange(hw, dtype=jnp.int32), (n_samples,))
    sample = jnp.repeat(sample_start + jnp.arange(n_samples, dtype=jnp.int32), hw)
    p_film, t_u, l_u = samplers.camera_sample(
        sampler, pixel, sample, cfg.width, cfg.pixel_filter,
        cfg.filter_radius, cfg.filter_alpha)
    o, d, _ = cam_mod.generate_rays(camera, p_film, t_u, l_u)
    L = trace_paths(scene, cfg, sampler, pixel, sample, o, d, strategy)
    return jnp.sum(L.reshape(n_samples, hw, 3), axis=0)


_render_chunk_jit = jax.jit(render_chunk,
                            static_argnames=("cfg", "n_samples", "strategy"))


def render(scene, camera, sampler, cfg, strategy="one"):
    hw = cfg.width * cfg.height
    acc = jnp.zeros((hw, 3), jnp.float32)
    s = 0
    while s < cfg.spp:
        ns = min(cfg.spp_chunk, cfg.spp - s)
        acc = acc + _render_chunk_jit(scene, camera, sampler, cfg, s, ns, strategy)
        s += ns
    return (acc / cfg.spp).reshape(cfg.height, cfg.width, 3)
