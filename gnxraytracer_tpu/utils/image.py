"""Image IO and tonemapping.

The reference keeps an in-loop tonemap inside its FrameBuffer
(/root/reference/ui/FrameBuffer.h:137-149) — a running average followed by
exposure mapping 1-exp(-v/(1-0.75)) to 8-bit.  Here the film stays linear
HDR (correct for parity/gradients); tonemapping happens only at export,
replicating the reference curve for visual comparison.
"""

import numpy as np


def tonemap_reference(img):
    """The reference exposure curve: 1 - exp(-v / (1 - 0.75))
    (ui/FrameBuffer.h:142-147)."""
    return 1.0 - np.exp(-np.asarray(img) / 0.25)


def to_srgb(img):
    x = np.clip(np.asarray(img), 0.0, 1.0)
    return np.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)


def to_uint8(img):
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(path, img, tonemap="reference"):
    """Save linear HDR (H,W,3) to PNG.  tonemap: reference | srgb | none."""
    if tonemap == "reference":
        img = tonemap_reference(img)
    elif tonemap == "srgb":
        img = to_srgb(img)
    arr = to_uint8(img)
    try:
        from PIL import Image

        Image.fromarray(arr).save(path)
    except ImportError:
        import imageio

        imageio.imwrite(path, arr)
    return path


def load_image(path, gamma=True, flip_v=False):
    """Load LDR/HDR image as float32 (H,W,3) linear.

    LDR images are gamma-decoded like the reference ImageTexture
    (textures/ImageTexture.h gamma convert); HDR (.hdr) loaded linearly
    like stbi_loadf.
    """
    import imageio.v2 as imageio

    arr = np.asarray(imageio.imread(path)).astype(np.float32)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    arr = arr[..., :3]
    if not path.lower().endswith((".hdr", ".exr")):
        arr = arr / 255.0
        if gamma:
            arr = np.where(arr <= 0.04045, arr / 12.92, ((arr + 0.055) / 1.055) ** 2.4)
    if flip_v:
        arr = arr[::-1]
    return arr
