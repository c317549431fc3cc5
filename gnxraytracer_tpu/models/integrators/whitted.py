"""Wavefront Whitted integrator.

Re-design of the reference WhittedIntegrator
(/root/reference/integrators/WhittedIntegrator.cpp:14-68) — the default
integrator of the reference app (ui/RenderThread.cpp:163, maxDepth=5):

  * at each hit: emitted L, then *all lights* sampled once each with
    f·Li·|cos|/pdf (no MIS — Whitted's direct loop),
  * then recursion only through specular reflection/transmission
    (core/Integrator.cpp:321-442).

Wavefront deviation (documented): the reference recurses into BOTH
SpecularReflect and SpecularTransmit (a branching tree); a wavefront keeps
one continuation ray per lane, so dielectric lanes pick reflect/transmit
stochastically by Fresnel weight (same estimator in expectation).  Mirror
lanes (the default scene's only specular) are identical to the reference.

Dimension layout: dims 0-4 camera; per depth d, base = 5 + d*(2*n_lights+2):
2 dims per light sample + 2 for the specular lobe choice.
"""

import jax
import jax.numpy as jnp

from ...constants import INFINITY
from ...ops import samplers, trace
from ...scene import camera as cam_mod
from ...utils.math import absdot
from .. import lights as lights_mod
from .. import materials as mat_mod
from .path import CAMERA_DIMS, RenderCfg, make_config  # noqa: F401  (shared cfg)


def trace_paths(scene, cfg: RenderCfg, sampler, pixel, sample, o, d):
    n = o.shape[0]
    dims_per_depth = 2 * cfg.n_lights + 2
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
        hit = trace.scene_intersect(scene, cfg, state["o"], state["d"],
                                    jnp.full((n,), INFINITY))
        it = trace.make_interaction(scene, cfg, state["o"], state["d"], hit)
        L = state["L"]

        # emitted (isect.Le) + escaped (infinite lights Le)
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
        ub = jax.lax.dynamic_slice(U, (jnp.int32(0), base), (n, dims_per_depth))

        # direct lighting: one sample from EVERY light (Whitted loop)
        for li_idx in range(cfg.n_lights):
            u_l = ub[:, 2 * li_idx: 2 * li_idx + 2]
            lidx = jnp.full((n,), li_idx, jnp.int32)
            ls = lights_mod.sample_li(scene, cfg, lidx, it.p, u_l)
            wi_local = trace.to_local(it, ls.wi)
            f, _pdf = mat_mod.evaluate(scene.materials, it.mat, cfg, wo_local, wi_local)
            f = f * absdot(ls.wi, it.ns)[..., None]
            can = alive & (ls.pdf > 0) & jnp.any(ls.li > 0, -1) & jnp.any(f > 0, -1)
            so, sd, st = trace.shadow_ray(it, ls.target, ls.is_infinite)
            occ = trace.scene_occluded(scene, cfg, so, sd, st)
            contrib = state["beta"] * f * ls.li / jnp.maximum(ls.pdf, 1e-12)[..., None]
            L = L + jnp.where((can & ~occ)[..., None], contrib, 0.0)

        # specular continuation (SpecularReflect/Transmit)
        u_s = ub[:, 2 * cfg.n_lights: 2 * cfg.n_lights + 2]
        smp = mat_mod.sample(scene.materials, it.mat, cfg, wo_local, u_s,
                             u_s[..., 0])
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


def render_chunk(scene, camera, sampler, cfg: RenderCfg, sample_start, n_samples):
    hw = cfg.width * cfg.height
    pixel = jnp.tile(jnp.arange(hw, dtype=jnp.int32), (n_samples,))
    sample = jnp.repeat(sample_start + jnp.arange(n_samples, dtype=jnp.int32), hw)
    p_film, t_u, l_u = samplers.camera_sample(
        sampler, pixel, sample, cfg.width, cfg.pixel_filter,
        cfg.filter_radius, cfg.filter_alpha)
    o, d, _ = cam_mod.generate_rays(camera, p_film, t_u, l_u)
    L = trace_paths(scene, cfg, sampler, pixel, sample, o, d)
    return jnp.sum(L.reshape(n_samples, hw, 3), axis=0)


_render_chunk_jit = jax.jit(render_chunk, static_argnames=("cfg", "n_samples"))


def render(scene, camera, sampler, cfg: RenderCfg):
    hw = cfg.width * cfg.height
    acc = jnp.zeros((hw, 3), jnp.float32)
    s = 0
    while s < cfg.spp:
        ns = min(cfg.spp_chunk, cfg.spp - s)
        acc = acc + _render_chunk_jit(scene, camera, sampler, cfg, s, ns)
        s += ns
    return (acc / cfg.spp).reshape(cfg.height, cfg.width, 3)
