"""Round-5: isolate the env-light costs the shading ablation surfaced
(full - const_env = ~337 ms/chunk).  Times each env op at wavefront
widths on the chip.

    python tools/exp_r5_env.py
"""

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

from gnxraytracer_tpu.models import lights
from gnxraytracer_tpu.scene import presets
from tools.profile_r5 import timed


def main():
    scene, camera = presets.envmap_mesh(500, 500)
    cfg_like = type("C", (), {})()
    from gnxraytracer_tpu.models.integrators import path
    cfg = path.make_config(scene, 500, 500, spp=4, max_depth=8,
                           spp_chunk=4)
    rs = np.random.RandomState(0)
    for n in (1_000_000, 500_000):
        d = rs.randn(n, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d_j = jnp.asarray(d)
        o_j = jnp.zeros((n, 3), jnp.float32)
        p_j = jnp.asarray(rs.randn(n, 3).astype(np.float32))
        u2 = jnp.asarray(rs.rand(n, 2).astype(np.float32))
        li = jnp.zeros((n,), jnp.int32)  # light 0

        # chained (iteration-dependent) loops so nothing hoists
        def chain(fn, x0, reps=8):
            def run():
                x = x0
                for _ in range(reps):
                    x = fn(x)
                return x
            return run

        timed(f"envmap_le x8 n={n}", jax.jit(chain(
            lambda dd: lights.envmap_le(scene, dd)[:, :1] * 1e-6 + dd,
            d_j)))
        timed(f"escaped_radiance x8 n={n}", jax.jit(chain(
            lambda dd: lights.escaped_radiance(scene, cfg, o_j, dd)[:, :1]
            * 1e-6 + dd, d_j)))

        def sample_once(pp):
            s = lights.sample_li(scene, cfg, li, pp, u2)
            return pp + s.li[:, :1] * 1e-7 + s.pdf[:, None] * 1e-7

        timed(f"sample_li x8 n={n}", jax.jit(chain(sample_once, p_j)))

        def pdf_once(pp):
            pdf = lights.pdf_li(scene, cfg, li, pp, d_j)
            return pp + pdf[:, None] * 1e-7

        timed(f"pdf_li x8 n={n}", jax.jit(chain(pdf_once, p_j)))


if __name__ == "__main__":
    main()
