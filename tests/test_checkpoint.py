import os

import pytest

import jax
import numpy as np

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance
from rust_pathtracer_tpu.utils.checkpoint import (
    RenderCheckpoint,
    load_checkpoint,
    render_radiance_checkpointed,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    p = os.path.join(tmp_path, "ck.npz")
    ck = RenderCheckpoint(
        acc=np.random.default_rng(0).random((64, 3)).astype(np.float32),
        samples_done=7,
        width=8,
        height=8,
        spp_total=16,
        key_data=np.asarray(jax.random.PRNGKey(3)),
        segments=123.0,
    )
    save_checkpoint(p, ck)
    got = load_checkpoint(p)
    assert np.array_equal(got.acc, ck.acc)
    assert got.samples_done == 7 and got.spp_total == 16
    assert np.array_equal(got.key_data, ck.key_data)


def test_resume_is_bitwise_exact(tmp_path):
    sd = get_scene("CornellBox")
    scene = sd.build()
    cam = sd.camera_at(0.0)
    s = RenderSettings(16, 16, 8, 4, (0.0, 0.0, 0.0), spp_chunk=2)
    key = jax.random.PRNGKey(1)

    ref, _ = render_radiance(scene, cam, s, key)

    # partial run: only 4 of 8 samples, checkpointed
    p = os.path.join(tmp_path, "ck.npz")
    s_half = RenderSettings(16, 16, 8, 4, (0.0, 0.0, 0.0), spp_chunk=2)
    import jax.numpy as jnp

    from rust_pathtracer_tpu.render import _render_chunk

    acc = jnp.zeros((16 * 16, 3), jnp.float32)
    for s0 in (0, 2):
        part, _ = _render_chunk(
            scene, cam, key, jnp.uint32(s0), jnp.zeros(3),
            width=16, height=16, spp_chunk=2, spp_total=8, max_bounces=4,
            rr_start=None, differentiable=False,
        )
        acc = acc + part
    save_checkpoint(p, RenderCheckpoint(
        acc=np.asarray(acc), samples_done=4, width=16, height=16,
        spp_total=8, key_data=np.asarray(key), segments=0.0,
    ))

    img, _ = render_radiance_checkpointed(scene, cam, s_half, key, p)
    assert np.array_equal(np.asarray(img), np.asarray(ref))


def test_mismatched_checkpoint_ignored(tmp_path):
    sd = get_scene("CornellBox")
    scene = sd.build()
    cam = sd.camera_at(0.0)
    s = RenderSettings(8, 8, 4, 3, (0.0, 0.0, 0.0))
    key = jax.random.PRNGKey(1)
    p = os.path.join(tmp_path, "ck.npz")
    # checkpoint from a different shape must be ignored, not crash
    save_checkpoint(p, RenderCheckpoint(
        acc=np.zeros((4, 3), np.float32), samples_done=2, width=2, height=2,
        spp_total=4, key_data=np.asarray(key), segments=0.0,
    ))
    ref, _ = render_radiance(scene, cam, s, key)
    img, _ = render_radiance_checkpointed(scene, cam, s, key, p)
    assert np.array_equal(np.asarray(img), np.asarray(ref))


class _Boom(RuntimeError):
    pass


def test_sharded_checkpoint_kill_and_resume(tmp_path, monkeypatch):
    """Kill the sharded render mid-frame; resume must be bitwise exact
    vs an uninterrupted run — including resuming on a DIFFERENT mesh
    shape (the persisted state is mesh-agnostic)."""
    import jax

    from rust_pathtracer_tpu.parallel import make_mesh
    from rust_pathtracer_tpu.parallel import shard as shard_mod
    from rust_pathtracer_tpu.utils.checkpoint import (
        render_radiance_sharded_checkpointed,
    )

    sd = get_scene("CornellBox")
    scene = sd.build()
    cam = sd.camera_at(0.0)
    # 8 samples, spp_chunk=2, 2 samples-groups -> 2 chunks per group
    s = RenderSettings(16, 16, 8, 4, (0.0, 0.0, 0.0), spp_chunk=2)
    key = jax.random.PRNGKey(7)
    mesh = make_mesh(tiles=2, samples=2, devices=jax.devices()[:4])

    p = os.path.join(tmp_path, "shard_ck.npz")
    ref, ref_stats = render_radiance_sharded_checkpointed(
        scene, cam, s, key, mesh, p + ".ref"
    )

    # crash after the first chunk completes (checkpoint already saved)
    real_run = shard_mod.ShardedChunkPlan.run_chunk
    calls = {"n": 0}

    def dying_run(self, c):
        if calls["n"] >= 1:
            raise _Boom()
        calls["n"] += 1
        return real_run(self, c)

    monkeypatch.setattr(shard_mod.ShardedChunkPlan, "run_chunk", dying_run)
    with pytest.raises(_Boom):
        render_radiance_sharded_checkpointed(scene, cam, s, key, mesh, p)
    monkeypatch.setattr(shard_mod.ShardedChunkPlan, "run_chunk", real_run)
    assert os.path.exists(p)

    # resume with a DIFFERENT tile count (4x2 instead of 2x2): tile
    # ownership is free to change; only the samples split must match
    mesh2 = make_mesh(tiles=4, samples=2, devices=jax.devices()[:8])
    img_resume, stats = render_radiance_sharded_checkpointed(
        scene, cam, s, key, mesh2, p
    )
    assert np.array_equal(np.asarray(img_resume), np.asarray(ref))
    assert float(stats.segments) == float(ref_stats.segments)

    # a checkpoint from a different samples split must be ignored (the
    # render restarts) and still produce the exact image
    mesh3 = make_mesh(tiles=2, samples=4, devices=jax.devices()[:8])
    img3, _ = render_radiance_sharded_checkpointed(
        scene, cam, s, key, mesh3, p
    )
    assert np.array_equal(np.asarray(img3), np.asarray(ref))


def test_checkpoint_resume_with_cascade(tmp_path):
    """Cascade-configured settings must survive interrupt/resume
    bitwise (the chunk renderer routes through the static cascade)."""
    import dataclasses

    sd = get_scene("CornellBox")
    scene = sd.build()
    cam = sd.camera_at(0.0)
    s = RenderSettings(16, 16, 8, 12, (0.0, 0.0, 0.0), spp_chunk=4,
                       cascade_schedule="8:2")
    key = jax.random.PRNGKey(2)
    path = str(tmp_path / "casc.ckpt")
    full, _ = render_radiance_checkpointed(scene, cam, s, key, path)

    # simulate an interrupt: render only chunk 0 (same spp_total so
    # the RNG counters match), save its state, resume from it
    import jax.numpy as jnp

    from rust_pathtracer_tpu.render import _render_chunk_cascaded

    part, _ = _render_chunk_cascaded(
        scene, cam, key, jnp.uint32(0), jnp.zeros(3),
        width=16, height=16, spp_chunk=4, spp_total=8, max_bounces=12,
        rr_start=None, schedule="8:2",
    )
    path2 = str(tmp_path / "casc2.ckpt")
    save_checkpoint(path2, RenderCheckpoint(
        acc=np.asarray(part), samples_done=4, width=16, height=16,
        spp_total=8, key_data=np.asarray(key), segments=0.0,
    ))
    resumed, _ = render_radiance_checkpointed(scene, cam, s, key, path2)
    assert np.array_equal(np.asarray(full), np.asarray(resumed))


def test_checkpointed_auto_overflow_recovers(tmp_path, monkeypatch):
    """cascade_schedule='auto' + checkpoint_every > 1 must NOT raise on
    overflow (round-3 advisor, medium): the renderer derived the
    schedule, so it owns the recovery — the overflowing window
    re-renders on the always-exact plain path.  An EXPLICIT schedule
    still raises."""
    import dataclasses

    import pytest

    from rust_pathtracer_tpu import render as render_mod
    from rust_pathtracer_tpu.render import CascadeOverflowError

    sd = get_scene("CornellBox")
    scene = sd.build()
    cam = sd.camera_at(0.0)
    key = jax.random.PRNGKey(2)
    # "1:64" is far too tight for CornellBox occupancy at bounce 1:
    # guaranteed overflow at 20x20x12 = 4800 lanes (width 75)
    monkeypatch.setattr(
        render_mod, "derive_cascade_schedule",
        lambda *a, **k: "1:64",
    )
    s = RenderSettings(20, 20, 12, 10, (0.0, 0.0, 0.0),
                       cascade_schedule="auto")
    img, _ = render_radiance_checkpointed(
        scene, cam, s, key, str(tmp_path / "auto.ckpt"),
        checkpoint_every=2,
    )
    # the recovery renders the plain path -> exactly the plain image
    plain = dataclasses.replace(s, cascade=False, cascade_schedule=None)
    ref, _ = render_radiance_checkpointed(
        scene, cam, plain, key, str(tmp_path / "plain.ckpt"),
        checkpoint_every=2,
    )
    assert np.array_equal(np.asarray(img), np.asarray(ref))

    s_explicit = dataclasses.replace(s, cascade_schedule="1:64")
    with pytest.raises(CascadeOverflowError):
        render_radiance_checkpointed(
            scene, cam, s_explicit, key, str(tmp_path / "exp.ckpt"),
            checkpoint_every=2,
        )


def test_sharded_checkpointed_resolves_auto(tmp_path):
    """mesh + checkpoint + cascade_schedule='auto' must actually
    resolve the schedule via the chunk-0 calibration (round-3 advisor:
    it silently rendered every chunk on the plain path) and match the
    non-checkpointed sharded auto render."""
    import dataclasses

    import jax

    from rust_pathtracer_tpu.parallel import make_mesh, render_radiance_sharded
    from rust_pathtracer_tpu.utils.checkpoint import (
        render_radiance_sharded_checkpointed,
    )

    sd = get_scene("CornellBox")
    scene = sd.build()
    cam = sd.camera_at(0.0)
    # enough bounces/chunks that a schedule derives and applies
    s = RenderSettings(16, 16, 16, 12, (0.0, 0.0, 0.0), spp_chunk=4,
                       cascade_schedule="auto")
    key = jax.random.PRNGKey(3)
    mesh = make_mesh(tiles=2, samples=2, devices=jax.devices()[:4])

    ref, ref_stats = render_radiance_sharded(scene, cam, s, key, mesh)
    img, stats = render_radiance_sharded_checkpointed(
        scene, cam, s, key, mesh, os.path.join(tmp_path, "auto_sh.npz"),
    )
    # chunk 0 renders plain in the non-checkpointed auto path but
    # cascaded in the checkpointed one (calibration is a separate
    # run there) -> same estimator, f32 accumulation order may differ
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(ref), rtol=2e-6, atol=2e-7
    )
    assert float(stats.segments) == float(ref_stats.segments)

    # resume must stay bitwise (the calibration re-derivation is
    # deterministic): kill after chunk 0, resume, compare
    full_path = os.path.join(tmp_path, "auto_res.npz")
    full, _ = render_radiance_sharded_checkpointed(
        scene, cam, s, key, mesh, full_path + ".ref",
    )
    plain = dataclasses.replace(s, cascade=False, cascade_schedule=None)
    _ = plain  # (schedule resolution happens inside; nothing to seed)
    # emulate interrupt: run once with checkpoint_every=1 then delete
    # nothing; a second call resumes from the last checkpoint
    img2, _ = render_radiance_sharded_checkpointed(
        scene, cam, s, key, mesh, full_path + ".ref",
    )
    assert np.array_equal(np.asarray(full), np.asarray(img2))
