"""Render orchestration: pixel grid -> ray wavefronts -> image.

Maps the reference renderer (renderer.rs:5-37) onto TPU execution:

* the nested rayon par_iter over rows x cols becomes one flat lane axis
  (all pixels x a chunk of samples) traced as a single wavefront;
* the sequential per-pixel spp loop becomes sample *chunks*: each chunk
  is one jitted device program; the accumulator stays on device;
* jitter u = (x + xi)/(w-1), v = (y + xi)/(h-1) (renderer.rs:22-25);
  rows are emitted top-to-bottom, i.e. image row r is y = height-1-r
  (renderer.rs:16 iterates y in reverse);
* pixel value = sqrt(mean) — gamma 2.0 (renderer.rs:30-31).

``render_radiance`` is fully differentiable w.r.t. scene arrays, camera
parameters, and the background color.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu import sampling
from rust_pathtracer_tpu.camera import Camera, camera_rays
from rust_pathtracer_tpu.integrator import TraceStats, trace


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """ImageSettings (scene.rs:19-25)."""

    width: int
    height: int
    samples_per_pixel: int
    max_bounces: int
    background: Tuple[float, float, float]
    # wavefront sizing: lanes per chunk = width * height * spp_chunk
    spp_chunk: Optional[int] = None
    # optional russian roulette start bounce (None = off, reference behavior)
    russian_roulette_start: Optional[int] = None
    # use the reverse-differentiable scan loop (fixed trip count)
    differentiable: bool = False

    # Default wavefront sizing.  v5e HBM holds ~1M-lane bounce state
    # comfortably; XLA pads some (N, small) while-carry temps to
    # 128-lane tiles, so 4M-lane chunks overflow 16G (measured).
    def resolve_chunk(self, target_lanes: int = 1 << 20) -> int:
        if self.spp_chunk is not None:
            return max(1, min(self.spp_chunk, self.samples_per_pixel))
        per_sample = self.width * self.height
        return max(1, min(self.samples_per_pixel, target_lanes // max(per_sample, 1)))


@dataclasses.dataclass(frozen=True)
class OutputSettings:
    """OutputSettings (scene.rs:27-36): one static frame, or fps*duration
    animation frames with the camera sampled at t = frame/frames
    (main.rs:51-53)."""

    image: RenderSettings
    fps: float = 0.0
    duration: float = 0.0

    @property
    def is_animation(self) -> bool:
        return self.fps > 0.0 and self.duration > 0.0

    @property
    def num_frames(self) -> int:
        return int(self.fps * self.duration) if self.is_animation else 1


def trace_pixel_lanes(
    scene,
    cam: Camera,
    base_key,
    pix,
    sample_offset,
    background,
    *,
    width: int,
    height: int,
    spp_chunk: int,
    spp_total: int,
    max_bounces: int,
    rr_start: Optional[int],
    differentiable: bool = False,
):
    """Trace len(pix)*spp_chunk lanes for the given pixel ids.

    Shared by the single-chip chunk loop and the shard_map tile path
    (parallel/shard.py) — pixel ids are data, so a device can own any
    tile of the image.  Returns (sum_radiance (len(pix), 3), stats).
    """
    npix = pix.shape[0]
    col = (pix % width).astype(jnp.float32)
    row = pix // width
    y = (height - 1 - row).astype(jnp.float32)  # renderer.rs:16: reversed rows

    # np (host) constants: avoid eager device arrays during tracing
    s_local = np.arange(spp_chunk, dtype=np.uint32)
    # lane counter = pixel * spp_total + sample  -> layout-invariant RNG:
    # the same (pixel, sample) draws the same numbers no matter how the
    # work is chunked or sharded.  spp_total may be traced (dynamic) —
    # keeping it out of the compile key lets one compiled integrator
    # serve every sample count.
    spp_total = jnp.uint32(spp_total)
    counters = (
        pix[:, None] * spp_total + (sample_offset + s_local)[None, :]
    ).reshape(-1)
    lkeys = sampling.lane_keys(base_key, counters)

    jit_u = sampling.uniform2(
        sampling.bounce_keys(lkeys, 0, sampling.P_PIXEL_JITTER)
    )
    x_l = jnp.repeat(col, spp_chunk)
    y_l = jnp.repeat(y, spp_chunk)
    u = (x_l + jit_u[:, 0]) / (width - 1.0)   # renderer.rs:23
    v = (y_l + jit_u[:, 1]) / (height - 1.0)  # renderer.rs:24

    lens_keys = sampling.bounce_keys(lkeys, 0, sampling.P_LENS)
    o, d = camera_rays(cam, u, v, lens_keys)

    rad, stats = trace(
        scene,
        o,
        d,
        lkeys,
        background,
        max_bounces=max_bounces,
        russian_roulette_start=rr_start,
        differentiable=differentiable,
    )

    # mask samples beyond spp_total (padded final chunk)
    sample_ids = (sample_offset + s_local)[None, :].astype(jnp.uint32)
    w_mask = (sample_ids < spp_total).astype(jnp.float32).reshape(1, -1)
    rad = rad.reshape(npix, spp_chunk, 3) * w_mask[..., None]
    return rad.sum(axis=1), stats


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp_chunk", "max_bounces", "rr_start",
        "differentiable",
    ),
)
def _render_chunk(
    scene,
    cam: Camera,
    base_key,
    sample_offset,
    background,
    *,
    width: int,
    height: int,
    spp_chunk: int,
    spp_total: int,
    max_bounces: int,
    rr_start: Optional[int],
    differentiable: bool,
):
    """Trace width*height*spp_chunk lanes; returns (sum_radiance (H*W,3), stats)."""
    pix = np.arange(width * height, dtype=np.uint32)
    return trace_pixel_lanes(
        scene,
        cam,
        base_key,
        pix,
        sample_offset,
        background,
        width=width,
        height=height,
        spp_chunk=spp_chunk,
        spp_total=spp_total,
        max_bounces=max_bounces,
        rr_start=rr_start,
        differentiable=differentiable,
    )


def render_radiance(
    scene,
    cam: Camera,
    settings: RenderSettings,
    key,
    background=None,
):
    """Linear-space mean radiance image (H, W, 3) + TraceStats.

    Differentiable w.r.t. scene arrays / camera / background.
    """
    spp = settings.samples_per_pixel
    chunk = settings.resolve_chunk()
    bg = jnp.asarray(
        settings.background if background is None else background, jnp.float32
    )

    acc = jnp.zeros((settings.width * settings.height, 3), jnp.float32)
    total_segments = jnp.float32(0.0)
    total_bounces = jnp.int32(0)
    total_occ = None
    for s0 in range(0, spp, chunk):
        part, stats = _render_chunk(
            scene,
            cam,
            key,
            jnp.uint32(s0),
            bg,
            width=settings.width,
            height=settings.height,
            spp_chunk=chunk,
            spp_total=spp,
            max_bounces=settings.max_bounces,
            rr_start=settings.russian_roulette_start,
            differentiable=settings.differentiable,
        )
        acc = acc + part
        total_segments = total_segments + stats.segments
        total_bounces = total_bounces + stats.bounces
        total_occ = stats.occupancy if total_occ is None else total_occ + stats.occupancy

    img = (acc / jnp.float32(spp)).reshape(settings.height, settings.width, 3)
    return img, TraceStats(
        segments=total_segments, bounces=total_bounces, occupancy=total_occ
    )


def render_image(scene, cam: Camera, settings: RenderSettings, key):
    """Render to gamma-2 RGB8, like renderer.rs:30-33 + vec3.rs:278-291."""
    from rust_pathtracer_tpu.utils.image import to_rgb8

    img, stats = render_radiance(scene, cam, settings, key)
    return to_rgb8(np.asarray(img)), stats
