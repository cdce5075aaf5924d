"""Donation/aliasing checks (SURVEY §5 race-detection slot).

JAX's functional purity is the primary race guard (the analog of the
reference's `Sync + Send` bounds, material.rs:15 / geometry.rs:46);
buffer donation is the aliasing discipline on top: the chunk-loop
accumulator is donated back to XLA each iteration, so the framework
must (a) actually consume the donated buffer (no silent copies) and
(b) never donate a buffer something else still references (the
checkpointed loop's rollback save deliberately opts out).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, _accumulate, render_radiance

KEY = jax.random.PRNGKey(3)


def test_accumulate_donates_carry():
    """The donated accumulator input is consumed in place: the input
    array is deleted after the call and the sum is exact."""
    acc = jnp.arange(12.0, dtype=jnp.float32).reshape(4, 3)
    part = jnp.ones((4, 3), jnp.float32)
    expect = np.asarray(acc) + 1.0
    out = _accumulate(acc, part)
    assert acc.is_deleted(), "donated chunk-loop carry was copied, not reused"
    np.testing.assert_array_equal(np.asarray(out), expect)
    # part is NOT donated — still readable
    np.testing.assert_array_equal(np.asarray(part), np.ones((4, 3)))


def test_chunked_render_unchanged_by_donation():
    """Multi-chunk accumulation through the donated carry is bitwise
    the single-chunk render (the chunk split only reorders which jit
    call produces each sample's radiance, not any arithmetic)."""
    sd = get_scene("CornellBox")
    scene = sd.build()
    cam = sd.camera_at(0.0)
    one = RenderSettings(16, 16, 8, 6, (0.0, 0.0, 0.0), spp_chunk=8)
    four = RenderSettings(16, 16, 8, 6, (0.0, 0.0, 0.0), spp_chunk=2)
    a, sa = render_radiance(scene, cam, one, KEY)
    b, sb = render_radiance(scene, cam, four, KEY)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(sa.segments) == float(sb.segments)


def test_checkpoint_rollback_not_donated():
    """The checkpointed loop keeps acc_save as a rollback anchor for
    cascade-overflow recovery — donation there would delete a buffer
    still referenced.  Pin that the resumable path still accumulates
    exactly (same image as the plain render)."""
    import os
    import tempfile

    from rust_pathtracer_tpu.utils.checkpoint import (
        render_radiance_checkpointed,
    )

    sd = get_scene("CornellBox")
    scene = sd.build()
    cam = sd.camera_at(0.0)
    s = RenderSettings(16, 16, 8, 6, (0.0, 0.0, 0.0), spp_chunk=2)
    path = os.path.join(tempfile.mkdtemp(), "ckpt.npz")
    img_c, _ = render_radiance_checkpointed(
        scene, cam, s, KEY, checkpoint_path=path, checkpoint_every=2
    )
    img_p, _ = render_radiance(scene, cam, s, KEY)
    np.testing.assert_array_equal(np.asarray(img_c), np.asarray(img_p))
