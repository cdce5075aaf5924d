"""Scene JSON schema: declarative scenes for the CLI and parity tests.

The reference has NO config system — scene choice is a source edit
(main.rs:20) and all knobs live in code (SURVEY §5).  BASELINE.json's
"same scene JSON" parity requirement lands here: every construct the
reference can express (6 scene archetypes, 4 materials, 3+1 textures,
spheres/rects/boxes/triangles/OBJ refs, static or orbiting cameras,
image + animation settings) round-trips through this schema.

Top-level document::

    {
      "perlin_seed": 0,
      "textures":   [{"type": "solid", "color": [r,g,b]},
                     {"type": "checker", "odd": ti, "even": ti, "frequency": 10.0},
                     {"type": "perlin", "scale": 4.0},
                     {"type": "image", "path": "tex.png"} |
                     {"type": "image", "data": [[[...]]]}],
      "materials":  [{"type": "lambertian", "texture": ti} |
                     {"type": "metal", "texture": ti, "fuzz": f} |
                     {"type": "dielectric", "ir": n} |
                     {"type": "light", "texture": ti}],
      "primitives": [{"type": "sphere", "center": [..], "radius": r, "material": mi} |
                     {"type": "rect", "plane": "xy|xz|yz", "start": [..], "end": [..],
                      "direction": +-1, "material": mi} |
                     {"type": "box", "start": [..], "end": [..], "material": mi} |
                     {"type": "triangle", "p1": [..], "p2": [..], "p3": [..],
                      "normal": [..]?, "material": mi} |
                     {"type": "obj", "path": "model.obj"}],
      "camera":     {"type": "static", "lookfrom": [..], "lookat": [..], "up": [..],
                     "vfov": deg, "aperture": a, "focus_dist": d}
                  | {"type": "orbit", ...SphereField orbit params...},
      "image":      {"width": w, "height": h, "samples_per_pixel": s,
                     "max_bounces": b, "background": [r,g,b]},
      "animation":  {"fps": 30.0, "duration": 10.0}?   // omit => static image
    }
"""

from __future__ import annotations

import json
import math
import os
from typing import Optional

import numpy as np

from rust_pathtracer_tpu.camera import Camera, make_camera
from rust_pathtracer_tpu.models.scenes import SceneDef
from rust_pathtracer_tpu.render import OutputSettings, RenderSettings
from rust_pathtracer_tpu.scene.builder import SceneBuilder


def _build_textures(b: SceneBuilder, specs, base_dir: str):
    ids = []
    for spec in specs:
        kind = spec["type"]
        if kind == "solid":
            ids.append(b.solid_texture(spec["color"]))
        elif kind == "checker":
            ids.append(
                b.checker_texture(
                    ids[spec["odd"]], ids[spec["even"]],
                    frequency=spec.get("frequency", 10.0),
                )
            )
        elif kind == "perlin":
            ids.append(b.perlin_texture(spec["scale"]))
        elif kind == "image":
            if "data" in spec:
                img = np.asarray(spec["data"], np.float32)
            else:
                from rust_pathtracer_tpu.utils.image import read_png

                img = read_png(os.path.join(base_dir, spec["path"])).astype(np.float32)
                img = (img / 255.0) ** 2.0  # sRGB-ish -> linear (gamma 2)
            ids.append(b.image_texture(img))
        else:
            raise ValueError(f"unknown texture type {kind!r}")
    return ids


def _build_materials(b: SceneBuilder, specs, tex_ids):
    ids = []
    for spec in specs:
        kind = spec["type"]
        if kind == "lambertian":
            ids.append(b.lambertian(tex_ids[spec["texture"]]))
        elif kind == "metal":
            ids.append(b.metal(tex_ids[spec["texture"]], spec["fuzz"]))
        elif kind == "dielectric":
            ids.append(b.dielectric(spec["ir"]))
        elif kind == "light":
            ids.append(b.diffuse_light(tex_ids[spec["texture"]]))
        else:
            raise ValueError(f"unknown material type {kind!r}")
    return ids


def _build_primitives(b: SceneBuilder, specs, mat_ids, base_dir: str):
    for spec in specs:
        kind = spec["type"]
        if kind == "sphere":
            b.add_sphere(spec["center"], spec["radius"], mat_ids[spec["material"]])
        elif kind == "rect":
            b.add_rect(
                spec["plane"], spec["start"], spec["end"],
                spec.get("direction", 1.0), mat_ids[spec["material"]],
            )
        elif kind == "box":
            b.add_box(spec["start"], spec["end"], mat_ids[spec["material"]])
        elif kind == "triangle":
            b.add_triangle(
                spec["p1"], spec["p2"], spec["p3"], mat_ids[spec["material"]],
                normal=spec.get("normal"),
            )
        elif kind == "obj":
            b.add_obj(os.path.join(base_dir, spec["path"]))
        else:
            raise ValueError(f"unknown primitive type {kind!r}")


def _camera_fn(spec, aspect):
    kind = spec.get("type", "static")
    if kind == "static":
        cam = make_camera(
            spec["lookfrom"], spec["lookat"], spec.get("up", (0.0, 1.0, 0.0)),
            spec["vfov"], aspect, spec.get("aperture", 0.0),
            spec.get("focus_dist", 10.0),
        )
        return lambda t: cam
    if kind == "orbit":
        # SphereField orbit (scene.rs:61-89): lookfrom =
        # (R cos 2πt, y0 + y1 sin πt, R sin 2πt)
        radius = spec.get("radius", 12.0)
        y0 = spec.get("y_base", 1.0)
        y1 = spec.get("y_amp", 2.0)
        lookat = spec.get("lookat", (0.0, 0.5, 0.0))
        up = spec.get("up", (0.0, 1.0, 0.0))
        vfov = spec.get("vfov", 20.0)
        aperture = spec.get("aperture", 0.1)
        focus = spec.get("focus_dist", 10.0)

        def cam_at(t: float) -> Camera:
            lookfrom = (
                radius * math.cos(2.0 * math.pi * t),
                y0 + y1 * math.sin(math.pi * t),
                radius * math.sin(2.0 * math.pi * t),
            )
            return make_camera(lookfrom, lookat, up, vfov, aspect, aperture, focus)

        return cam_at
    raise ValueError(f"unknown camera type {kind!r}")


def scene_def_from_dict(doc: dict, base_dir: str = ".", name: str = "json") -> SceneDef:
    img = doc["image"]
    settings = RenderSettings(
        width=int(img["width"]),
        height=int(img["height"]),
        samples_per_pixel=int(img["samples_per_pixel"]),
        max_bounces=int(img["max_bounces"]),
        background=tuple(img["background"]),
    )
    anim = doc.get("animation")
    output = OutputSettings(
        image=settings,
        fps=float(anim["fps"]) if anim else 0.0,
        duration=float(anim["duration"]) if anim else 0.0,
    )

    def build(use_bvh="auto"):
        b = SceneBuilder(perlin_seed=int(doc.get("perlin_seed", 0)))
        tex_ids = _build_textures(b, doc.get("textures", []), base_dir)
        mat_ids = _build_materials(b, doc.get("materials", []), tex_ids)
        _build_primitives(b, doc["primitives"], mat_ids, base_dir)
        return b.build(use_bvh=use_bvh)

    camera_at = _camera_fn(doc["camera"], settings.width / settings.height)
    return SceneDef(name=name, build=build, camera_at=camera_at, output=output)


def load_scene_json(path: str) -> SceneDef:
    with open(path) as f:
        doc = json.load(f)
    return scene_def_from_dict(
        doc,
        base_dir=os.path.dirname(os.path.abspath(path)),
        name=os.path.splitext(os.path.basename(path))[0],
    )


def save_scene_json(path: str, doc: dict) -> None:
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
