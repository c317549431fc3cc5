"""Reference parity harness (VERDICT round-1 item #1).

Drives the headless reference oracle (tools/ref_oracle/) — the UNMODIFIED
reference render core with a linear FrameBuffer stub — over the parity
configs, stores its linear float images as goldens in tests/golden/, and
records the reference's measured throughput for bench.py's vs_baseline.

Usage:
  python tools/parity.py goldens        # (re)generate tests/golden/ref_*.npz
  python tools/parity.py baseline       # measure reference Mpaths/s at bench scale
  python tools/parity.py compare        # render ours (CPU) and print error table

Acceptance bar (also documented in PARITY.md): bit parity is impossible
(static per-bounce sampler dims vs the reference's data-dependent counter),
so parity is statistical: at equal scene/integrator settings, the 8x8
block-averaged images must agree within the MC standard error envelope.
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
ORACLE = os.path.join(REPO, "tools", "ref_oracle", "build", "oracle")
GOLDEN = os.path.join(REPO, "tests", "golden")

# name -> (W, H, spp, integrator, maxDepth, sigma, strategy, skybox)
# spp is high so the oracle golden's own MC error is small vs ours.
CONFIGS = {
    "ref_path_cornell": (64, 64, 2048, "path", 8, 60.0, "uniform", 1),
    "ref_path_lambert": (64, 64, 2048, "path", 8, 0.0, "uniform", 0),
    "ref_direct_cornell": (64, 64, 2048, "direct", 5, 0.0, "uniform", 0),
    "ref_whitted_cornell": (64, 64, 2048, "whitted", 5, 60.0, "uniform", 1),
    "ref_path_cornell128": (128, 128, 1024, "path", 8, 60.0, "uniform", 1),
}


def build_oracle():
    if not os.path.exists(ORACLE):
        subprocess.run([os.path.join(REPO, "tools", "ref_oracle", "build.sh")],
                       check=True)


def run_oracle(name, cfg):
    build_oracle()
    w, h, spp, integ, depth, sigma, strat, sky = cfg
    raw = f"/tmp/{name}.raw"
    r = subprocess.run(
        [ORACLE, raw, str(w), str(h), str(spp), integ, str(depth),
         str(sigma), strat, str(sky)],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, check=True)
    meta = json.loads(r.stderr.decode().strip().splitlines()[-1])
    img = np.fromfile(raw, np.float32).reshape(h, w, 3)
    return img, meta


def cmd_goldens():
    os.makedirs(GOLDEN, exist_ok=True)
    for name, cfg in CONFIGS.items():
        img, meta = run_oracle(name, cfg)
        out = os.path.join(GOLDEN, f"{name}.npz")
        np.savez_compressed(out, image=img, meta=json.dumps(meta))
        print(f"{out}: mean={img.mean():.4f} {meta}")


def cmd_baseline():
    """Measure the reference at the two headline workloads on this host."""
    out = {}
    for key, cfg in {
        # bench.py workload: 500^2, 256 spp, path depth 8
        "path_500px_256spp": (500, 500, 256, "path", 8, 60.0, "uniform", 1),
        # the reference app's own default: whitted depth 5, 32 spp
        "whitted_500px_32spp": (500, 500, 32, "whitted", 5, 60.0, "uniform", 1),
    }.items():
        _, meta = run_oracle("baseline_" + key, cfg)
        out[key] = meta
        print(key, meta)
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump({
            "host": "2-core Xeon 2.1GHz (builder VM), reference compiled -O2 -fopenmp",
            "note": "headless oracle (tools/ref_oracle) = unmodified reference "
                    "render core; scene = RenderThread.cpp Cornell minus the "
                    "missing dragon asset",
            "workloads": out,
        }, f, indent=1)
    print("wrote", path)


def block_mean(img, b=8):
    h, w, c = img.shape
    return img[: h // b * b, : w // b * b].reshape(h // b, b, w // b, b, c).mean((1, 3))


def compare_one(name, ours, spp_ours):
    z = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    ref = z["image"]
    meta = json.loads(str(z["meta"]))
    d = ours - ref
    bref, bours = block_mean(ref), block_mean(ours)
    bd = np.abs(bours - bref).mean() / max(bref.mean(), 1e-9)
    return {
        "config": name,
        "ref_mean": [round(float(x), 4) for x in ref.mean((0, 1))],
        "ours_mean": [round(float(x), 4) for x in ours.mean((0, 1))],
        "pix_mad_rel": round(float(np.abs(d).mean() / ref.mean()), 4),
        "block8_mad_rel": round(float(bd), 4),
        "ref_spp": meta["spp"], "ours_spp": spp_ours,
    }


def render_ours(name, spp):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from gnxraytracer_tpu.scene import presets
    from gnxraytracer_tpu.models.integrators import direct as D
    from gnxraytracer_tpu.models.integrators import path as P
    from gnxraytracer_tpu.models.integrators import whitted as Wt
    from gnxraytracer_tpu.ops import samplers

    w, h, _, integ, depth, sigma, _strat, sky = CONFIGS[name]
    scene, cam = presets.cornell_box(w, h, sigma=sigma, skybox=bool(sky))
    cfg = P.make_config(scene, w, h, spp=spp, max_depth=depth, spp_chunk=32)
    smp = samplers.make_halton_sampler(spp, w, h)
    mod = {"path": P, "direct": D, "whitted": Wt}[integ]
    acc = jnp.zeros((w * h, 3), jnp.float32)
    s = 0
    while s < spp:
        ns = min(32, spp - s)
        acc = acc + mod._render_chunk_jit(scene, cam, smp, cfg, s, ns)
        s += ns
    return np.asarray(acc).reshape(h, w, 3) / spp


def cmd_compare():
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    for name in CONFIGS:
        if name.endswith("128"):
            continue
        ours = render_ours(name, spp)
        print(json.dumps(compare_one(name, ours, spp)))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "compare"
    {"goldens": cmd_goldens, "baseline": cmd_baseline,
     "compare": cmd_compare}[cmd]()
