"""Fault injection: SIGKILL a real render process mid-frame, resume
from its checkpoint, assert bitwise equality with an uninterrupted run.

This is the failure-detection/recovery slot of SURVEY §5 exercised the
hard way — a hardware-style crash (SIGKILL: no atexit, no finally, no
flush), not a python exception.  The reference loses the whole frame on
any crash (main.rs panics; its only "recovery" is that completed
animation frames remain on disk, main.rs:67-71).  Here the per-chunk
checkpoint (utils/checkpoint.py, atomic writes) + counter-based RNG
make the resumed image bitwise identical.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from rust_pathtracer_tpu.utils.checkpoint import load_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(args, n_dev=8):
    env = dict(os.environ)
    # the test process already runs on the CPU backend (conftest); the
    # subprocess must too, with an n_dev-device virtual mesh (the CLI
    # mesh must cover every device, so the resume-on-different-tiles
    # variant changes the device count between runs)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
    return subprocess.Popen(
        [sys.executable, "-m", "rust_pathtracer_tpu.cli", *args],
        cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
    )


def _run_to_completion(args, n_dev=8):
    proc = _spawn(args, n_dev=n_dev)
    _, err = proc.communicate(timeout=600)
    assert proc.returncode == 0, err.decode(errors="replace")[-2000:]
    return proc.returncode


def _kill_once_checkpointed(proc, ckpt_path, png_path, timeout=300.0):
    """SIGKILL the process as soon as a checkpoint exists (mid-render:
    the output PNG must not exist yet)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if os.path.exists(ckpt_path):
            proc.send_signal(signal.SIGKILL)
            rc = proc.wait(timeout=60)
            assert rc == -signal.SIGKILL, rc
            assert not os.path.exists(png_path), (
                "render finished before the kill — grow the workload"
            )
            return
        if proc.poll() is not None:
            pytest.fail(
                f"render exited (rc={proc.returncode}) before any "
                "checkpoint was written"
            )
        time.sleep(0.02)
    proc.kill()
    pytest.fail("no checkpoint appeared within the timeout")


def _common_args(out_dir, spp):
    return [
        "--scene", "CornellBox", "--width", "24", "--height", "24",
        "--spp", str(spp), "--spp-chunk", "2", "--max-bounces", "6",
        "--quiet", "--output-dir", out_dir,
    ]


def test_sigkill_resume_bitwise(tmp_path):
    spp = 64  # 32 chunks: the kill always lands mid-frame
    ref_dir = str(tmp_path / "ref")
    _run_to_completion(
        _common_args(ref_dir, spp)
        + ["--checkpoint", str(tmp_path / "ref.ckpt")]
    )

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "kill.ckpt")
    png = os.path.join(out_dir, "image_0000.png")
    proc = _spawn(_common_args(out_dir, spp) + ["--checkpoint", ckpt])
    _kill_once_checkpointed(proc, ckpt, png)

    # the checkpoint must hold genuine partial progress (not a restart)
    ck = load_checkpoint(ckpt)
    assert ck is not None and 0 < ck.samples_done < spp

    _run_to_completion(_common_args(out_dir, spp) + ["--checkpoint", ckpt])

    ref_png = os.path.join(ref_dir, "image_0000.png")
    with open(ref_png, "rb") as f:
        ref_bytes = f.read()
    with open(png, "rb") as f:
        out_bytes = f.read()
    assert ref_bytes == out_bytes


def test_sigkill_resume_bitwise_sharded(tmp_path):
    """Sharded render killed mid-frame resumes on a DIFFERENT tile
    count (2x2 -> 4x2; the checkpoint is mesh-agnostic over tiles) and
    still produces the bitwise-identical image."""
    spp = 64
    ref_dir = str(tmp_path / "ref")
    _run_to_completion(
        _common_args(ref_dir, spp)
        + ["--mesh", "2x2", "--checkpoint", str(tmp_path / "ref.ckpt")],
        n_dev=4,
    )

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "kill.ckpt")
    png = os.path.join(out_dir, "image_0000.png")
    proc = _spawn(
        _common_args(out_dir, spp) + ["--mesh", "2x2", "--checkpoint", ckpt],
        n_dev=4,
    )
    _kill_once_checkpointed(proc, ckpt, png)

    ck = load_checkpoint(ckpt)
    assert ck is not None and 0 < ck.samples_done < spp

    # resume on a DIFFERENT tile count (and device count): 2x2 -> 4x2
    _run_to_completion(
        _common_args(out_dir, spp) + ["--mesh", "4x2", "--checkpoint", ckpt],
        n_dev=8,
    )

    with open(os.path.join(ref_dir, "image_0000.png"), "rb") as f:
        ref_bytes = f.read()
    with open(png, "rb") as f:
        out_bytes = f.read()
    assert ref_bytes == out_bytes
