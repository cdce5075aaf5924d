"""Differentiable rendering API.

No reference counterpart — the reference is forward-only.  This module
exposes the gradients BASELINE.json's north star demands: pixel
gradients w.r.t. **material albedo, emission, texture texels and camera
parameters**, computed by detached-sampling reparameterization (see
integrator.py): random decisions and the discrete hit search are
stopped, while radiance stays differentiable through

  camera params -> ray origin/direction -> hit point -> texture eval ->
  attenuation/emission products -> pixel radiance.

Typical use::

    params = DiffParams.from_scene(scene, cam_params)
    loss, grads = render_loss_and_grad(params, scene, settings, key, target)
    # grads.tex_color, grads.tex_images, grads.background, grads.camera.*
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rust_pathtracer_tpu.camera import Camera, make_camera
from rust_pathtracer_tpu.render import RenderSettings, render_radiance


class CameraParams(NamedTuple):
    """The 7 constructor parameters of Camera::new (camera.rs:14-22),
    kept unresolved so gradients reach each of them."""

    lookfrom: jnp.ndarray
    lookat: jnp.ndarray
    up: jnp.ndarray
    vfov_deg: jnp.ndarray
    aspect: jnp.ndarray
    aperture: jnp.ndarray
    focus_dist: jnp.ndarray

    @classmethod
    def create(cls, lookfrom, lookat, up, vfov_deg, aspect, aperture=0.0, focus_dist=1.0):
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            f32(lookfrom), f32(lookat), f32(up), f32(vfov_deg), f32(aspect),
            f32(aperture), f32(focus_dist),
        )

    def build(self) -> Camera:
        return make_camera(
            self.lookfrom, self.lookat, self.up, self.vfov_deg, self.aspect,
            self.aperture, self.focus_dist,
        )


class DiffParams(NamedTuple):
    """The differentiable leaves: texture colors (albedo + emission both
    live in the texture table), image texels, background, camera."""

    tex_color: jnp.ndarray   # Textures.color
    tex_images: jnp.ndarray  # Textures.images
    background: jnp.ndarray  # (3,)
    camera: CameraParams

    @classmethod
    def from_scene(cls, scene, camera: CameraParams, background) -> "DiffParams":
        return cls(
            tex_color=scene.textures.color,
            tex_images=scene.textures.images,
            background=jnp.asarray(background, jnp.float32),
            camera=camera,
        )


def apply_params(scene, params: DiffParams):
    """Swap the differentiable leaves into the scene pytree."""
    textures = scene.textures._replace(
        color=params.tex_color, images=params.tex_images
    )
    return dataclasses.replace(scene, textures=textures)


def render_radiance_diff(params: DiffParams, scene, settings: RenderSettings, key):
    """Differentiable radiance image as a function of ``params``."""
    settings = dataclasses.replace(settings, differentiable=True)
    scene = apply_params(scene, params)
    img, _ = render_radiance(
        scene, params.camera.build(), settings, key, background=params.background
    )
    return img


def l2_loss(params: DiffParams, scene, settings, key, target) -> jnp.ndarray:
    img = render_radiance_diff(params, scene, settings, key)
    return 0.5 * jnp.mean((img - jnp.asarray(target)) ** 2)


def render_loss_and_grad(params, scene, settings, key, target):
    """(loss, dloss/dparams) — the inverse-rendering training step."""
    return jax.value_and_grad(l2_loss)(params, scene, settings, key, target)
