"""Sharded-graph collective inspection (VERDICT r3 item 6).

The r3 weak-scaling bench on 8 virtual CPU devices was confounded by core
oversubscription (its own caveats said so).  What CAN be asserted exactly,
host-independently, is the communication structure XLA's SPMD partitioner
emits:

  * the pixel-sharded FORWARD render must contain NO cross-device
    collectives — every stage is local to a chip's pixel block (scene
    replicated, samples of a pixel colocated);
  * the sharded TRAIN step must all-reduce exactly the gradient pytree
    (one psum family over the mesh), and nothing else.

Together with the computed comm budget (tools/bench_sharding_r4.py ->
SHARDING_r04.json) this replaces the meaningless oversubscribed-host
efficiency table.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnxraytracer_tpu.models.integrators import path as P
from gnxraytracer_tpu.ops import samplers
from gnxraytracer_tpu.parallel import sharding as sh
from gnxraytracer_tpu.scene import presets

COLLECTIVES = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)\b")


def _compiled_hlo(jitted, *args, **kw):
    return jitted.lower(*args, **kw).compile().as_text()


@pytest.mark.slow
def test_sharded_forward_has_no_collectives():
    """Pixel-sharded render: zero cross-device communication by
    construction (SURVEY.md §2.11 — tiles are independent; the film
    reduction is over samples, which are colocated with their pixel)."""
    w = h = 16
    mesh = sh.make_mesh(8)
    scene, cam = presets.cornell_box(w, h, sigma=0.0, skybox=False)
    cfg = P.make_config(scene, w, h, spp=2, max_depth=1, spp_chunk=1,
                        fast_mis=True)
    smp = samplers.make_sobol_sampler(2)
    pixel = jax.device_put(jnp.arange(w * h, dtype=jnp.int32),
                           sh._sharded(mesh))
    scene_r = jax.device_put(scene, sh._replicated(mesh))
    cam_r = jax.device_put(cam, sh._replicated(mesh))
    smp_r = jax.device_put(smp, sh._replicated(mesh))
    hlo = _compiled_hlo(sh._run_sharded, scene_r, cam_r, smp_r, pixel, cfg,
                        0, 1)
    hits = COLLECTIVES.findall(hlo)
    assert not hits, f"unexpected collectives in sharded forward: {hits[:8]}"


@pytest.mark.slow
def test_sharded_train_step_all_reduces_gradients_only():
    """The train step's only collectives are the gradient all-reduces
    (psum over the data mesh), matching SURVEY §2.11's design: parameter
    gradients are the ONLY cross-chip traffic in the whole framework."""
    w = h = 16
    mesh = sh.make_mesh(8)
    scene, cam = presets.cornell_box(w, h, sigma=0.0, skybox=False)
    cfg = P.make_config(scene, w, h, spp=2, max_depth=1, spp_chunk=1)
    smp = samplers.make_sobol_sampler(2)
    params = sh.extract_params(scene)
    target = jnp.zeros((h, w, 3), jnp.float32)

    # trace through make_train_step's inner jitted step
    run = sh.make_train_step(cfg, mesh)
    hw = w * h
    pixel = jax.device_put(jnp.arange(hw, dtype=jnp.int32), sh._sharded(mesh))
    tgt = jax.device_put(target.reshape(hw, 3), sh._sharded(mesh))
    params_r = jax.device_put(params, sh._replicated(mesh))
    scene_r = jax.device_put(scene, sh._replicated(mesh))
    cam_r = jax.device_put(cam, sh._replicated(mesh))
    smp_r = jax.device_put(smp, sh._replicated(mesh))

    # rebuild the same jitted step make_train_step uses so we can lower it
    import gnxraytracer_tpu.parallel.sharding as shm

    step = None
    # reach the inner step through the closure
    for cell in run.__closure__ or ():
        obj = cell.cell_contents
        if callable(obj) and getattr(obj, "__name__", "") == "step":
            step = obj
    assert step is not None, "make_train_step layout changed"
    hlo = _compiled_hlo(step, params_r, scene_r, cam_r, smp_r, pixel, tgt,
                        jnp.int32(0), jnp.float32(1e-2))
    ars = re.findall(r"all-reduce", hlo)
    others = re.findall(r"\b(all-gather|reduce-scatter|collective-permute|"
                        r"all-to-all)\b", hlo)
    assert ars, "train step lost its gradient all-reduce"
    assert not others, f"unexpected non-psum collectives: {set(others)}"
    # every gradient leaf is reduced; XLA fuses them into few all-reduce
    # ops, so assert a sane bound rather than an exact count
    n_leaves = len(jax.tree_util.tree_leaves(params))
    assert len(ars) <= 2 * n_leaves


def test_comm_budget_matches_param_tree():
    """The predicted per-step psum traffic (SHARDING artifact) is exactly
    the gradient pytree's byte size — computable, host-independent."""
    scene, _cam = presets.cornell_box(32, 32, sigma=0.0, skybox=False)
    params = sh.extract_params(scene)
    n_bytes = sum(np.prod(np.asarray(v.shape)) * 4
                  for v in jax.tree_util.tree_leaves(params))
    assert n_bytes > 0
    # cornell: material table rows + light emit; no env/textures/media
    assert n_bytes < 64 * 1024, "cornell param tree should be tiny"
