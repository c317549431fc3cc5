"""Round-5: which SHADING stage dominates the mesh chunk now?

The round-5 device profile (tools/profile_chunk) shows the wide-kernel
casts at ~20% of chunk device time; generic XLA fusions + whiles carry
the rest.  This times the full bench chunk against scene variants that
remove one ingredient each:

  full        : Disney blob + EWA-textured floor + HDR env (the bench)
  matte_blob  : blob Disney -> matte        (isolates Disney eval)
  flat_floor  : floor texture -> constant   (isolates MIPMap/EWA)
  const_env   : HDR env -> skybox constant  (isolates env CDF + NEE pdf)

    python tools/exp_r5_shading.py
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

import numpy as np

from gnxraytracer_tpu.models.integrators import path
from gnxraytracer_tpu.ops import samplers
from gnxraytracer_tpu.scene import presets
from gnxraytracer_tpu.scene.presets import (SceneBuilder, _rot_x, _rot_y,
                                            _translate,
                                            make_perspective_camera)
from tools.profile_r5 import timed

W = H = 500
CHUNK = 4


def variant(name):
    from gnxraytracer_tpu.scene.loaders import make_blob_mesh
    from gnxraytracer_tpu.utils.image import load_image

    b = SceneBuilder()
    if name == "matte_blob":
        mat = b.add_matte((0.6, 0.5, 0.45))
    else:
        mat = b.add_disney((0.6, 0.5, 0.45), rough_u=0.35, metallic=0.1)
    n_seg = max(8, int(round((104_882 / 2) ** 0.5)))
    v, t, n, uv = make_blob_mesh(n_seg)
    b.add_mesh(v, t, mat, transform=_translate([0.0, -0.5, 0.0]),
               normals=n, uvs=uv)
    if name == "flat_floor":
        floor_mat = b.add_matte((0.5, 0.5, 0.5), sigma=0.0)
    else:
        tex = b.add_texture(load_image(
            "/root/reference/Resources/awesomeface.jpg", gamma=True))
        floor_mat = b.add_matte((1.0, 1.0, 1.0), sigma=0.0, kd_tex=tex)
    g = 6.0
    gv = np.array([[-g, -1.7, g], [g, -1.7, g], [-g, -1.7, -g],
                   [g, -1.7, g], [g, -1.7, -g], [-g, -1.7, -g]], np.float32)
    guv = np.array([[0, 0], [4, 0], [0, 4], [4, 0], [4, 4], [0, 4]],
                   np.float32)
    b.add_mesh(gv, np.arange(6).reshape(2, 3), floor_mat, uvs=guv)
    if name == "const_env":
        b.add_skybox_light()
    else:
        img = load_image("/root/reference/Resources/MonValley1000.hdr")
        l2w = _rot_x(20) @ _rot_y(-90) @ _rot_x(-90)
        b.set_environment(img, light_to_world=l2w)
    scene = b.build(bvh=True)
    cam = make_perspective_camera(W, H, eye=(0.0, 0.8, 5.0),
                                  look=(0.0, -0.3, 0.0))
    return scene, cam


def main():
    sampler = samplers.make_sobol_sampler(64)
    for name in ("full", "matte_blob", "flat_floor", "const_env"):
        scene, camera = variant(name)
        cfg = path.make_config(scene, W, H, spp=64, max_depth=8,
                               spp_chunk=CHUNK, rr_threshold=1.0,
                               fast_mis=True, compact_tail=True,
                               pipeline_casts=True,
                               compact_stages=((0, 2), (1, 16), (2, 32),
                                               (4, 64)),
                               count_rays=True)
        timed(f"chunk {name}",
              lambda scene=scene, camera=camera, cfg=cfg:
              path._render_chunk_jit(scene, camera, sampler, cfg, 0,
                                     CHUNK)[0])


if __name__ == "__main__":
    main()
