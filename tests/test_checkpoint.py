import os

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
