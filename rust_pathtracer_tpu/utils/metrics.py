"""Metrics / observability.

The reference's observability is a progress bar and one stray println
(SURVEY §5).  The framework reports the numbers BASELINE.json judges:
rays/sec/chip, per-bounce occupancy, wall-clock per stage — plus an
optional jax.profiler trace for roofline work.
"""

from __future__ import annotations

import contextlib
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class RenderMetrics:
    width: int = 0
    height: int = 0
    spp: int = 0
    segments: float = 0.0
    wall_seconds: float = 0.0
    frames: int = 0
    occupancy: Optional[List[float]] = None  # alive lanes per bounce

    def add_occupancy(self, occ) -> None:
        occ = [float(x) for x in occ]
        if self.occupancy is None:
            self.occupancy = occ
        else:
            self.occupancy = [a + b for a, b in zip(self.occupancy, occ)]

    @property
    def rays_per_sec(self) -> float:
        return self.segments / self.wall_seconds if self.wall_seconds else 0.0

    @property
    def avg_path_length(self) -> float:
        lanes = self.width * self.height * self.spp * max(self.frames, 1)
        return self.segments / lanes if lanes else 0.0

    def report(self, file=sys.stderr) -> None:
        print(
            f"[metrics] {self.width}x{self.height}@{self.spp}spp x{max(self.frames,1)} "
            f"frames: {self.segments:.3g} ray segments in {self.wall_seconds:.2f}s "
            f"=> {self.rays_per_sec:.3g} rays/s, avg path length "
            f"{self.avg_path_length:.2f}",
            file=file,
        )
        if self.occupancy and self.occupancy[0] > 0:
            total = self.occupancy[0]
            frac = [x / total for x in self.occupancy if x > 0][:16]
            curve = " ".join(f"{x:.2f}" for x in frac)
            print(f"[metrics] wavefront occupancy by bounce: {curve}", file=file)


# ---------------------------------------------------------------------------
# Roofline accounting (SURVEY §5: rays/s vs the chip's HBM/compute bounds)
# ---------------------------------------------------------------------------

# v5e single-chip peaks.  f32 matmul runs at 1/4 the bf16 MXU rate; the
# VPU figure is 8 sublanes x 128 lanes x 4 ALUs at ~0.94 GHz.
CHIP_PEAKS = {
    "v5e": dict(mxu_f32=4.9e13, vpu_f32=3.9e12, hbm=8.1e11),
}


@dataclass
class StageRoofline:
    name: str
    flops_mxu: float
    flops_vpu: float
    bytes_hbm: float

    def sol_seconds(self, peaks) -> float:
        """Speed-of-light time: the stage can't run faster than its most
        contended resource allows."""
        return max(
            self.flops_mxu / peaks["mxu_f32"],
            self.flops_vpu / peaks["vpu_f32"],
            self.bytes_hbm / peaks["hbm"],
        )

    def bound(self, peaks) -> str:
        times = {
            "MXU": self.flops_mxu / peaks["mxu_f32"],
            "VPU": self.flops_vpu / peaks["vpu_f32"],
            "HBM": self.bytes_hbm / peaks["hbm"],
        }
        return max(times, key=times.get)


# approximate per-unit costs (flops / bytes), documented estimates from
# reading the kernels — coarse on purpose: the roofline states which
# resource BINDS and the order-of-magnitude headroom, not a 2-digit SOL
_V1_FLOPS_PER_PAIR = 30          # unrolled typed test (VPU)
_V2_DOT_FLOPS = 8 * 2 * 6        # six (R,8)x(8,C) projections (MXU)
_V2_FORMULA_FLOPS = 25           # per (ray, col) epilogue (VPU)
_SHADE_FLOPS_PER_LANE = 600      # record + 4-way material + RNG (VPU)
_STATE_BYTES_PER_LANE = 220      # wavefront state r/w per bounce (HBM)


def bounce_roofline(scene, lanes: int, swept_fraction: float = 1.0,
                    reorder: bool = False):
    """Per-stage roofline for ONE bounce of ``lanes`` rays.

    ``swept_fraction``: fraction of (ray block, cluster) sweeps the
    culling does NOT skip (1.0 = dense).  Returns list[StageRoofline].
    """
    stages = []
    if scene.kinds_static is not None:
        P = scene.num_prims
        stages.append(StageRoofline(
            "v1 sweep", 0.0, lanes * P * _V1_FLOPS_PER_PAIR,
            lanes * 40.0,
        ))
    elif scene.proj is not None:
        C = scene.proj.num_cols
        pairs = lanes * C * swept_fraction
        stages.append(StageRoofline(
            "v2 sweep",
            pairs * _V2_DOT_FLOPS + lanes * scene.proj.col_block * 64,
            pairs * _V2_FORMULA_FLOPS + lanes * scene.proj.col_block * 3,
            lanes * 170.0,  # rays in, t/c/payload out
        ))
        if reorder:
            import math

            passes = max(math.log2(max(lanes, 2)), 1.0)
            stages.append(StageRoofline(
                "reorder", 0.0, lanes * 64.0,
                lanes * (8.0 * 2 * passes + 96.0),  # sort passes + state gather
            ))
    else:
        P = scene.num_prims
        stages.append(StageRoofline(
            "jnp sweep", 0.0, lanes * P * _V1_FLOPS_PER_PAIR,
            lanes * P * 4.0,  # XLA materializes per-pair t columns
        ))
    stages.append(StageRoofline(
        "shade+record", 0.0, lanes * _SHADE_FLOPS_PER_LANE,
        lanes * _STATE_BYTES_PER_LANE,
    ))
    return stages


def roofline_report(scene, lanes: int, bounces: float, measured_seconds: float,
                    swept_fraction: float = 1.0, reorder: bool = False,
                    chip: str = "v5e", backward: bool = False):
    """Compare a measured step time against the analytic speed of light.

    ``bounces``: average live-lane-weighted bounce count executed;
    ``backward``: double compute+traffic for the reverse sweep (the
    detached hit search does not rerun, but shading and its residual
    traffic do — a ~2x model).  Returns a dict for printing/JSON.
    """
    peaks = CHIP_PEAKS[chip]
    stages = bounce_roofline(scene, lanes, swept_fraction, reorder)
    per_bounce = sum(s.sol_seconds(peaks) for s in stages)
    dominant = max(stages, key=lambda s: s.sol_seconds(peaks))
    sol = per_bounce * bounces * (2.0 if backward else 1.0)
    return {
        "sol_seconds": sol,
        "sol_fraction": sol / measured_seconds if measured_seconds else 0.0,
        "bound": f"{dominant.name}:{dominant.bound(peaks)}",
        "stages": {
            s.name: {"sol_ms": s.sol_seconds(peaks) * 1e3 * bounces,
                     "bound": s.bound(peaks)}
            for s in stages
        },
    }


@dataclass
class StageTimer:
    """Named wall-clock stages (scene build, compile, render, io)."""

    stages: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def report(self, file=sys.stderr) -> None:
        for name, dt in self.stages.items():
            print(f"[timing] {name}: {dt:.2f}s", file=file)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace wrapper (enabled when log_dir given)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ProgressBar:
    """Frame-level progress (indicatif counterpart, main.rs:42-49)."""

    def __init__(self, total: int, prefix: str = "rendering", file=sys.stderr):
        self.total = total
        self.done = 0
        self.prefix = prefix
        self.file = file
        self.t0 = time.perf_counter()

    def tick(self, n: int = 1) -> None:
        self.done += n
        elapsed = time.perf_counter() - self.t0
        rate = self.done / elapsed if elapsed > 0 else 0.0
        eta = (self.total - self.done) / rate if rate > 0 else float("inf")
        pct = 100.0 * self.done / self.total if self.total else 100.0
        print(
            f"\r{self.prefix}: {self.done}/{self.total} ({pct:.0f}%) "
            f"elapsed {elapsed:.0f}s eta {eta:.0f}s",
            end="",
            file=self.file,
            flush=True,
        )

    def finish(self) -> None:
        print(file=self.file)
