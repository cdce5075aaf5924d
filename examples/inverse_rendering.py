"""Inverse rendering demo: recover scene parameters from a target image.

The capability the reference cannot express: render a target with known
materials, perturb them, and recover via gradient descent through the
path tracer (detached-sampling reparameterized gradients, grad.py).

    PYTHONPATH= JAX_PLATFORMS=cpu python examples/inverse_rendering.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu.grad import CameraParams, DiffParams, l2_loss, render_radiance_diff
from rust_pathtracer_tpu.render import RenderSettings
from rust_pathtracer_tpu.scene.builder import SceneBuilder
from rust_pathtracer_tpu.utils.image import to_rgb8, write_png


def main():
    b = SceneBuilder()
    b.add_sphere((0.0, 0.2, -3.0), 1.0, b.lambertian((0.8, 0.2, 0.5)))
    b.add_sphere((0.0, -101.0, -3.0), 100.0, b.lambertian((0.4, 0.6, 0.3)))
    b.add_rect("xz", (-3.0, 4.0, -6.0), (3.0, 4.0, 0.0), -1.0, b.diffuse_light((4.0, 4.0, 4.0)))
    scene = b.build()
    cam = CameraParams.create((0, 0.5, 0.5), (0, 0, -3), (0, 1, 0), 55.0, 1.0)
    settings = RenderSettings(64, 64, 16, 5, (0.6, 0.7, 0.9))
    key = jax.random.PRNGKey(0)

    params_true = DiffParams.from_scene(scene, cam, settings.background)
    target = render_radiance_diff(params_true, scene, settings, key)
    write_png("./output/inverse_target.png", to_rgb8(np.asarray(target)))

    # forget the sphere albedo (joint multi-material recovery can hit
    # boundary local minima of the polynomial multi-bounce loss; the
    # single-unknown problem is convex enough for plain Adam)
    params = params_true._replace(
        tex_color=params_true.tex_color.at[0].set(jnp.full(3, 0.5))
    )

    import optax

    # optimize ONLY the unknown texture row — the gradient pytree covers
    # every texture (including the light's emission), so mask the rest
    unknown = jnp.zeros_like(params.tex_color).at[0].set(1.0)

    opt = optax.adam(3e-2)
    opt_state = opt.init(params.tex_color)
    grad_fn = jax.jit(
        lambda p: jax.value_and_grad(l2_loss)(p, scene, settings, key, target)
    )
    for i in range(150):
        loss, grads = grad_fn(params)
        updates, opt_state = opt.update(grads.tex_color * unknown, opt_state)
        new_tex = optax.apply_updates(params.tex_color, updates)
        # clip only the optimized row — a blanket clip would clamp the
        # light's emission (4,4,4) to 1!
        new_tex = jnp.where(unknown > 0, jnp.clip(new_tex, 0.0, 1.0), new_tex)
        params = params._replace(tex_color=new_tex)
        if i % 25 == 0:
            print(f"step {i:3d}  loss {float(loss):.3e}")

    print("true sphere albedo:", np.asarray(params_true.tex_color[0]))
    print("recovered        :", np.round(np.asarray(params.tex_color[0]), 3))
    final = render_radiance_diff(params, scene, settings, key)
    write_png("./output/inverse_recovered.png", to_rgb8(np.asarray(final)))
    print("wrote ./output/inverse_target.png and ./output/inverse_recovered.png")


if __name__ == "__main__":
    main()
