"""Per-bounce alive / NEE-candidate fractions for the mesh bench chunk
(round-4: how much shading width is wasted on dead lanes?)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".cache", "jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from gnxraytracer_tpu.models import lights as lights_mod
from gnxraytracer_tpu.models import materials as mat_mod
from gnxraytracer_tpu.models.integrators import path
from gnxraytracer_tpu.ops import samplers, trace
from gnxraytracer_tpu.ops.samplers import camera_sample
from gnxraytracer_tpu.scene import presets
from gnxraytracer_tpu.scene.camera import generate_rays

W = H = 500


def main():
    scene, camera = presets.envmap_mesh(W, H)
    cfg = path.make_config(scene, W, H, spp=64, max_depth=8, spp_chunk=4,
                           rr_threshold=1.0, fast_mis=True)
    sampler = samplers.make_sobol_sampler(64)
    n = W * H * 4
    pixel = jnp.tile(jnp.arange(W * H, dtype=jnp.int32), 4)
    sample = jnp.repeat(jnp.arange(4, dtype=jnp.int32), W * H)
    p_film, t_, p_lens = camera_sample(sampler, pixel, sample, W)
    o, d, _ = generate_rays(camera, p_film, t_, p_lens)

    state = dict(o=o, d=d, alive=jnp.ones((n,), bool))
    import functools

    @functools.partial(jax.jit, static_argnames=("b",))
    def step(o, d, alive, b):
        hit = trace.scene_intersect(scene, cfg, o, d,
                                    jnp.where(alive, 1e30, 0.0))
        it = trace.make_interaction(scene, cfg, o, d, hit)
        alive2 = alive & hit.hit & (b < cfg.max_depth)
        mats_row = mat_mod.gather_material_table(scene.materials,
                                                 jnp.maximum(it.mat, 0))
        has_ns = mat_mod.has_nonspecular(mats_row, None, cfg)
        # cosine bounce continuation for stats
        wo_local = trace.to_local(it, it.wo)
        k = jax.random.PRNGKey(b)
        u = jax.random.uniform(k, (n, 2))
        smp = mat_mod.sample(mats_row, None, cfg, wo_local, u, u[:, 0], None)
        wi_world = trace.to_world(it, smp.wi)
        no, nd = trace.spawn_ray(it, wi_world)
        alive3 = alive2 & smp.valid
        return (jnp.where(alive3[:, None], no, o),
                jnp.where(alive3[:, None], nd, d), alive3,
                alive.mean(), (alive & hit.hit).mean(),
                (alive2 & has_ns).mean())

    for b in range(6):
        o, d, al, f_in, f_hit, f_nee = step(state["o"], state["d"],
                                            state["alive"], b)
        print(f"bounce {b}: entering alive {float(f_in):.3f}  hit "
              f"{float(f_hit):.3f}  NEE-width {float(f_nee):.3f}",
              flush=True)
        state = dict(o=o, d=d, alive=al)


if __name__ == "__main__":
    main()
