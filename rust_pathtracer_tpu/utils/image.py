"""Host-side image finishing and IO.

Quantization matches the reference exactly: gamma 2.0 via sqrt after
averaging (renderer.rs:30-31), then ``(v * 255.999) as u8`` with Rust's
*saturating* float->int cast semantics — overshoot clamps to 255,
negatives to 0, NaN to 0 (vec3.rs:278-291).

PNG frames are written like main.rs:67-91 (8-bit RGB); GIF assembly is
provided for animations (the reference declares the ``gif`` crate but
never uses it — SphereField.gif was assembled externally).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def gamma_encode(linear: np.ndarray) -> np.ndarray:
    """sqrt gamma (renderer.rs:31); clamps negatives to 0 first."""
    return np.sqrt(np.maximum(np.nan_to_num(linear, nan=0.0), 0.0))


def quantize_u8(value: np.ndarray) -> np.ndarray:
    """(v * 255.999) with saturating cast (vec3.rs:279-287)."""
    v = np.nan_to_num(np.asarray(value, np.float64), nan=0.0) * 255.999
    return np.clip(v, 0.0, 255.0).astype(np.uint8)


def to_rgb8(linear_mean: np.ndarray) -> np.ndarray:
    """Linear mean radiance (H, W, 3) -> gamma-2 RGB8."""
    return quantize_u8(gamma_encode(linear_mean))


def write_png(path: str, rgb8: np.ndarray) -> None:
    """8-bit RGB PNG (main.rs:78-91)."""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(np.asarray(rgb8, np.uint8), mode="RGB").save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def write_gif(path: str, frames: Sequence[np.ndarray], fps: float) -> None:
    """Assemble animation frames into a GIF (reference parity for
    preview/SphereField.gif, which was produced outside the code)."""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imgs = [Image.fromarray(np.asarray(f, np.uint8), mode="RGB") for f in frames]
    # one adaptive (median-cut) palette shared by every frame, with
    # Floyd-Steinberg dithering — PIL's default per-frame web-safe
    # conversion bands smooth gradients and flickers between frames.
    # Build the palette from a montage sampled ACROSS frames (a
    # fade-in first frame would otherwise pin a near-black palette on
    # the whole animation).
    sample_idx = sorted({0, len(imgs) // 2, len(imgs) - 1})
    sample = [np.asarray(imgs[i]) for i in sample_idx]
    montage = Image.fromarray(np.concatenate(sample, axis=0), mode="RGB")
    base = montage.quantize(colors=256, method=Image.Quantize.MEDIANCUT)
    pal = [
        im.quantize(palette=base, dither=Image.Dither.FLOYDSTEINBERG)
        for im in imgs
    ]
    pal[0].save(
        path,
        save_all=True,
        append_images=pal[1:],
        duration=int(1000.0 / fps),
        loop=0,
    )


def frame_path(output_dir: str, frame_index: int) -> str:
    """./output/image_{:04}.png (main.rs:67)."""
    return os.path.join(output_dir, f"image_{frame_index:04d}.png")
