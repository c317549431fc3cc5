"""Live progressive viewers — the CLI replacement for the reference's Qt
display stack (/root/reference/ui/IMAGraphicsView.cpp + DisplayWidget's
PaintBuffer signal): after each progressive chunk the current estimate is
either drawn into the terminal (24-bit ANSI half-blocks, two pixels per
character cell) or rewritten to a PNG a file watcher / image viewer can
follow. Tonemap matches FrameBuffer::update_f_u_c's export curve
(ui/FrameBuffer.h:142-147)."""

import sys

import numpy as np


def _tonemap(img, mode="reference"):
    img = np.maximum(np.asarray(img, np.float32), 0.0)
    if mode == "reference":
        # 1 - exp(-v / (1 - 0.75)) (ui/FrameBuffer.h:142)
        return 1.0 - np.exp(-img / 0.25)
    if mode == "srgb":
        return np.clip(img, 0, 1) ** (1 / 2.2)
    return np.clip(img, 0, 1)


def term_preview(img, max_cols=100, tonemap="reference", out=None):
    """Draw an (H, W, 3) linear image into the terminal using ▀ half-blocks
    (one char = two vertical pixels), 24-bit color."""
    out = out or sys.stdout
    h, w = img.shape[:2]
    cols = min(max_cols, w)
    rows_px = max(2, int(round(cols * h / w)))
    rows_px += rows_px % 2
    ys = (np.linspace(0, h - 1, rows_px)).astype(int)
    xs = (np.linspace(0, w - 1, cols)).astype(int)
    small = _tonemap(img[ys][:, xs], tonemap)
    rgb = (np.clip(small, 0, 1) * 255).astype(int)
    lines = []
    for r in range(0, rows_px, 2):
        top = rgb[r]
        bot = rgb[r + 1]
        cells = [
            f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
            for t, b in zip(top, bot)
        ]
        lines.append("".join(cells) + "\x1b[0m")
    out.write("\n".join(lines) + "\n")
    out.flush()
    return rows_px // 2  # lines drawn (caller can cursor-up to redraw)


def term_redraw_prefix(n_lines):
    """ANSI cursor-up so the next term_preview overwrites the previous."""
    return f"\x1b[{n_lines}A" if n_lines else ""


class LivePngWriter:
    """Rewrites a PNG with the current progressive estimate after each
    chunk — the file-based analogue of the Qt PaintBuffer signal."""

    def __init__(self, path, tonemap="reference"):
        self.path = path
        self.tonemap = tonemap

    def update(self, img):
        from .image import save_png

        save_png(self.path, img, tonemap=self.tonemap)
