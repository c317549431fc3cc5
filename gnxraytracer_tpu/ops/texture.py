"""Image textures: host-side mip pyramid build + differentiable lookup.

Replaces the reference texture stack (/root/reference/core/Texture.h:105,
core/MIPMap.h, textures/ImageTexture.h): textures are resampled host-side
to a common power-of-two resolution and stacked into one (K, H, W, 3)
device array; lookups are bilinear (or trilinear across the stacked
pyramid) gathers + lerps — differentiable w.r.t. texels (the gradient is a
scatter-add, which jax generates automatically for gather transposes).

The mip pyramid is stored widest-level-first inside the H axis of a
(K, H_total, W, 3) atlas with per-level row offsets, so one array carries
all levels of all textures.
"""

import jax.numpy as jnp
import numpy as np


def _resize_pow2(img, size):
    """Box-filter resample to (size, size) (the reference uses Lanczos,
    MIPMap.h resampleWeights; box is sufficient for minification)."""
    h, w = img.shape[:2]
    ys = (np.linspace(0, h - 1, size)).astype(int)
    xs = (np.linspace(0, w - 1, size)).astype(int)
    return img[ys][:, xs]


def build_texture_atlas(images, base_size=256):
    """Stack images into a mip atlas.

    Returns (atlas (K, H_total, base, 3) jnp, level_offsets (L,), level_sizes (L,)).
    H_total = base + base/2 + ... + 1.
    """
    levels = int(np.log2(base_size)) + 1
    sizes = [base_size >> l for l in range(levels)]
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
    h_total = int(np.sum(sizes))
    atlas = np.zeros((len(images), h_total, base_size, 3), np.float32)
    for k, img in enumerate(images):
        img = np.asarray(img, np.float32)
        level = _resize_pow2(img, base_size)
        for l, s in enumerate(sizes):
            if l > 0:
                # 2x2 box downsample of previous level
                prev = level
                level = 0.25 * (
                    prev[0::2, 0::2] + prev[1::2, 0::2]
                    + prev[0::2, 1::2] + prev[1::2, 1::2]
                )
            atlas[k, offsets[l]: offsets[l] + s, :s] = level
    return (jnp.asarray(atlas), jnp.asarray(offsets), jnp.asarray(sizes, jnp.int32))


def bilinear_lookup(atlas, offsets, sizes, tex_id, uv, level=0):
    """Bilinear texel lookup at a mip level (MIPMap::triangle,
    core/MIPMap.h:226 semantics, Repeat wrap mode).

    atlas: (K, H_total, W, 3); tex_id: (N,); uv: (N,2).
    """
    if isinstance(level, int):
        s = sizes[level]
        off = offsets[level]
    else:
        # per-lane levels: pow-2 pyramid arithmetic instead of per-lane
        # table gathers (sizes[l] = base >> l, offsets[l] = 2b - b>>(l-1))
        base = sizes[0]
        s = base >> level
        off = jnp.where(level == 0, 0,
                        2 * base - (base >> jnp.maximum(level - 1, 0)))
    sf = s.astype(jnp.float32)
    u = uv[..., 0] * sf - 0.5
    v = uv[..., 1] * sf - 0.5
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = (u - u0.astype(jnp.float32))[..., None]
    dv = (v - v0.astype(jnp.float32))[..., None]

    def texel(ui, vi):
        ui = jnp.mod(ui, s)
        vi = jnp.mod(vi, s)
        return atlas[tex_id, off + vi, ui]

    return (
        (1 - du) * (1 - dv) * texel(u0, v0)
        + du * (1 - dv) * texel(u0 + 1, v0)
        + (1 - du) * dv * texel(u0, v0 + 1)
        + du * dv * texel(u0 + 1, v0 + 1)
    )


def ewa_lookup(atlas, offsets, sizes, tex_id, uv, dst0, dst1,
               max_anisotropy=8.0, window=8):
    """Anisotropic EWA filtering (MIPMap::Lookup(st, dst0, dst1) + EWA,
    core/MIPMap.h:259-338).

    The reference scans a data-dependent ellipse bounding box per lookup;
    here every lane scans a fixed (window x window) texel footprint at the
    chosen mip level (the lod rule makes the minor axis ~1 texel, and the
    eccentricity clamp bounds the major axis to max_anisotropy texels, so a
    fixed window loses only extreme-anisotropy tails) with the same
    exp(-2 r^2) - exp(-2) falloff as the reference's weight LUT
    (MIPMap.h EWA weightLut init). Two adjacent levels are blended.

    uv: (N,2); dst0/dst1: (N,2) texture-space footprint axes.
    """
    # swap so dst0 is the major axis
    l0 = jnp.sum(dst0 * dst0, -1)
    l1 = jnp.sum(dst1 * dst1, -1)
    swap = (l0 < l1)[..., None]
    d0 = jnp.where(swap, dst1, dst0)
    d1 = jnp.where(swap, dst0, dst1)
    major = jnp.sqrt(jnp.maximum(jnp.sum(d0 * d0, -1), 1e-20))
    minor = jnp.sqrt(jnp.maximum(jnp.sum(d1 * d1, -1), 1e-20))
    # clamp eccentricity
    scale = jnp.where(minor * max_anisotropy < major,
                      major / (minor * max_anisotropy), 1.0)
    d1 = d1 * scale[..., None]
    minor = minor * scale

    n_levels = sizes.shape[0]
    lod = jnp.clip(n_levels - 1.0 + jnp.log2(jnp.maximum(minor, 1e-8)), 0.0,
                   n_levels - 1.0)
    l0i = jnp.floor(lod).astype(jnp.int32)
    dl = (lod - l0i.astype(jnp.float32))[..., None]

    # --- round-4 fast path: segment gathers instead of per-texel gathers.
    # The old loop issued window^2 per-lane texel gathers per level (128 at
    # window=8) — measured ~2.6 ms EACH at 1M lanes, 660 ms/chunk on the
    # mesh bench.  Rows of 8 texels are stored as aligned 24-float segment
    # rows (a pure reshape of the atlas, so texel gradients still flow);
    # each window row needs at most TWO segments (the window is <= 9 wide),
    # which a per-lane barrel rotate aligns to the window start.  Taps,
    # weights, and texel values are IDENTICAL to the per-texel loop.
    k_tex, h_tot, w_tex = atlas.shape[0], atlas.shape[1], atlas.shape[2]
    use_seg = (w_tex % 8 == 0) and window <= 9
    seg = atlas.reshape(-1, 24) if use_seg else None
    segs_per_row = w_tex // 8 if use_seg else 0
    base = sizes[0]

    def ewa_level(level_idx):
        """level_idx: (N,) per-lane mip level.  Level size/offset come from
        arithmetic on the pow-2 pyramid (sizes[l] = base >> l; offsets[l] =
        2*base - base >> (l-1)) — no per-lane table gathers.  The footprint
        scan runs ONCE for all lanes at per-lane levels (the reference
        scans a per-lookup ellipse bbox, MIPMap.h:298-324; a fixed
        window x window scan is the vectorized equivalent)."""
        si = base >> level_idx
        s = si.astype(jnp.float32)
        off = jnp.where(level_idx == 0, 0,
                        2 * base - (base >> jnp.maximum(level_idx - 1, 0)))
        st = uv * s[..., None] - 0.5
        e0 = d0 * s[..., None]
        e1 = d1 * s[..., None]
        a = e0[..., 1] ** 2 + e1[..., 1] ** 2 + 1.0
        b = -2.0 * (e0[..., 0] * e0[..., 1] + e1[..., 0] * e1[..., 1])
        c = e0[..., 0] ** 2 + e1[..., 0] ** 2 + 1.0
        inv_f = 1.0 / (a * c - 0.25 * b * b)
        a = a * inv_f
        b = b * inv_f
        c = c * inv_f
        s0 = jnp.round(st[..., 0]).astype(jnp.int32) - window // 2
        t0 = jnp.round(st[..., 1]).astype(jnp.int32) - window // 2
        acc = jnp.zeros(uv.shape[:-1] + (3,), jnp.float32)
        wsum = jnp.zeros(uv.shape[:-1], jnp.float32)
        if use_seg:
            nbs = jnp.maximum(si >> 3, 1)
            c0 = jnp.mod(s0, si)                # window-start col in [0, si)
            b_a = jnp.minimum(c0 >> 3, nbs - 1)
            b_b = jnp.mod(b_a + 1, nbs)
            rot = c0 & 7
            small = si < 8                       # si in {1,2,4}: periodize
            row_base = tex_id * h_tot + off
        for it in range(window):
            tt = (t0 + it).astype(jnp.float32) - st[..., 1]
            if use_seg:
                vi = jnp.mod(t0 + it, si)
                rb = (row_base + vi) * segs_per_row
                seg_a = seg[rb + b_a]            # (N, 24) = 8 texels RGB
                seg_b = seg[rb + b_b]
                cat = jnp.concatenate([seg_a, seg_b], axis=-1)  # 16 texels
                # barrel-rotate left by `rot` texels: position k -> col
                # (c0 + k) mod si for si >= 8 (for si == 8 the two halves
                # are the same segment, so the mod-16 roll wraps mod 8)
                for sh in (4, 2, 1):
                    rolled = jnp.roll(cat, -3 * sh, axis=-1)
                    cat = jnp.where(((rot & sh) != 0)[..., None], rolled, cat)
            for is_ in range(window):
                ss_ = (s0 + is_).astype(jnp.float32) - st[..., 0]
                r2 = a * ss_ * ss_ + b * ss_ * tt + c * tt * tt
                w = jnp.where(r2 < 1.0,
                              jnp.exp(-2.0 * r2) - jnp.exp(-2.0), 0.0)
                if use_seg:
                    # si in {1,2,4}: `(c0+is_) mod si` = masked index into
                    # segment A with only 1/2/4 static candidates
                    ci = c0 + is_
                    p2 = jnp.where(((ci & 1) == 1)[..., None],
                                   seg_a[..., 3:6], seg_a[..., 0:3])
                    i4a = jnp.where(((ci & 1) == 1)[..., None],
                                    seg_a[..., 3:6], seg_a[..., 0:3])
                    i4b = jnp.where(((ci & 1) == 1)[..., None],
                                    seg_a[..., 9:12], seg_a[..., 6:9])
                    p4 = jnp.where(((ci & 2) == 2)[..., None], i4b, i4a)
                    small_texel = jnp.where(
                        (si == 1)[..., None], seg_a[..., 0:3],
                        jnp.where((si == 2)[..., None], p2, p4))
                    texel = jnp.where(
                        small[..., None], small_texel,
                        cat[..., 3 * is_: 3 * is_ + 3])
                else:
                    ui = jnp.mod(s0 + is_, si)
                    vi = jnp.mod(t0 + it, si)
                    texel = atlas[tex_id, off + vi, ui]
                acc = acc + w[..., None] * texel
                wsum = wsum + w
        return acc, wsum

    acc0, w0 = ewa_level(l0i)
    acc1, w1 = ewa_level(jnp.minimum(l0i + 1, n_levels - 1))
    fallback = bilinear_lookup(atlas, offsets, sizes, tex_id, uv, 0)

    def finish(acc, wsum):
        ok = (wsum > 1e-8)[..., None]
        return jnp.where(ok, acc / jnp.maximum(wsum[..., None], 1e-8),
                         fallback)

    return (1.0 - dl) * finish(acc0, w0) + dl * finish(acc1, w1)


def trilinear_lookup(atlas, offsets, sizes, tex_id, uv, width):
    """Trilinear lookup with filter width -> mip level selection
    (MIPMap::Lookup(st, width), core/MIPMap.h:226-258)."""
    n_levels = sizes.shape[0]
    base = sizes[0].astype(jnp.float32)
    level_f = n_levels - 1 + jnp.log2(jnp.maximum(width, 1e-8))
    level_f = jnp.clip(level_f + jnp.log2(base) - (n_levels - 1), 0.0,
                       n_levels - 1.0)
    l0 = jnp.floor(level_f).astype(jnp.int32)
    dl = (level_f - l0.astype(jnp.float32))[..., None]
    # two-level blend at per-lane levels (bilinear_lookup gathers the level
    # size/offset per lane, so no static level unroll is needed)
    out0 = bilinear_lookup(atlas, offsets, sizes, tex_id, uv, l0)
    out1 = bilinear_lookup(atlas, offsets, sizes, tex_id, uv,
                           jnp.minimum(l0 + 1, n_levels - 1))
    return (1 - dl) * out0 + dl * out1
