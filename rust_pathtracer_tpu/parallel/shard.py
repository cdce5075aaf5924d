"""shard_map distributed rendering over a (tiles, samples) mesh.

Maps the reference's rayon pixel fan-out (renderer.rs:14-18) onto a
device mesh:

* pixel ids are sharded over the ``tiles`` axis — each device traces
  only its tile of the image (scene tables replicate; they are small);
* the spp loop splits over the ``samples`` axis — each samples-group
  traces a disjoint sample range for the same pixels and partial sums
  are combined with one ``lax.psum`` (an XLA collective riding ICI);
* the counter-based RNG (render.py) keys off (pixel, sample) globally,
  so the sharded image is bitwise-identical to the single-device one.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from rust_pathtracer_tpu.camera import Camera
from rust_pathtracer_tpu.integrator import TraceStats
from rust_pathtracer_tpu.parallel.mesh import SAMPLE_AXIS, TILE_AXIS
from rust_pathtracer_tpu.render import RenderSettings, trace_pixel_lanes


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def render_radiance_sharded(
    scene,
    cam: Camera,
    settings: RenderSettings,
    key,
    mesh,
    background=None,
):
    """Distributed render; returns ((H, W, 3) radiance, TraceStats).

    The image lives sharded over ``tiles`` until the final host gather.
    """
    width, height = settings.width, settings.height
    spp = settings.samples_per_pixel
    n_tiles = mesh.shape[TILE_AXIS]
    n_samples_axis = mesh.shape[SAMPLE_AXIS]

    npix = width * height
    npix_pad = _round_up(npix, n_tiles)
    # each samples-group owns a contiguous sample range
    spp_shard = -(-spp // n_samples_axis)
    chunk = min(settings.resolve_chunk(), spp_shard)
    n_chunks = -(-spp_shard // chunk)

    bg = jnp.asarray(
        settings.background if background is None else background, jnp.float32
    )

    pix_per_tile = npix_pad // n_tiles

    def tile_body(scene, cam, key, bg):
        # derive this device's pixel ids from its mesh coordinate — no
        # sharded input arrays, so the same code runs under multi-host
        # jax.distributed without host-local/global array conversions.
        # padded ids wrap to pixel 0 harmlessly and are cropped later.
        tile = jax.lax.axis_index(TILE_AXIS).astype(jnp.uint32)
        pix = (
            tile * np.uint32(pix_per_tile)
            + jnp.arange(pix_per_tile, dtype=jnp.uint32)
        ) % np.uint32(npix)
        s_group = jax.lax.axis_index(SAMPLE_AXIS)
        base = (s_group * spp_shard).astype(jnp.uint32)
        acc = jnp.zeros((pix.shape[0], 3), jnp.float32)
        segments = jnp.float32(0.0)
        bounces = jnp.int32(0)
        occupancy = None
        for c in range(n_chunks):
            part, stats = trace_pixel_lanes(
                scene,
                cam,
                key,
                pix,
                base + jnp.uint32(c * chunk),
                bg,
                width=width,
                height=height,
                spp_chunk=chunk,
                spp_total=spp,
                max_bounces=settings.max_bounces,
                rr_start=settings.russian_roulette_start,
                differentiable=settings.differentiable,
            )
            acc = acc + part
            segments = segments + stats.segments
            bounces = bounces + stats.bounces
            occupancy = stats.occupancy if occupancy is None else occupancy + stats.occupancy
        # combine sample-partial sums (the renderer's "all-reduce")
        acc = jax.lax.psum(acc, SAMPLE_AXIS)
        segments = jax.lax.psum(segments, (SAMPLE_AXIS, TILE_AXIS))
        bounces = jax.lax.pmax(bounces, (SAMPLE_AXIS, TILE_AXIS))
        occupancy = jax.lax.psum(occupancy, (SAMPLE_AXIS, TILE_AXIS))
        return acc, segments, bounces, occupancy

    mapped = jax.shard_map(
        tile_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(TILE_AXIS), P(), P(), P()),
    )

    @jax.jit
    def run(scene, cam, key, bg):
        acc, segments, bounces, occupancy = mapped(scene, cam, key, bg)
        # padded sample range: lanes with sample_id >= spp are masked
        # inside trace_pixel_lanes, so the sum is exact.
        img = (acc[:npix] / jnp.float32(spp)).reshape(height, width, 3)
        return img, segments, bounces, occupancy

    img, segments, bounces, occupancy = run(scene, cam, key, bg)
    return img, TraceStats(segments=segments, bounces=bounces, occupancy=occupancy)
