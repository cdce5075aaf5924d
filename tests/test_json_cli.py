import json
import os

import jax
import numpy as np
import pytest

from rust_pathtracer_tpu.render import RenderSettings, render_radiance
from rust_pathtracer_tpu.scene.json_io import load_scene_json, scene_def_from_dict

CORNELL_DOC = {
    "perlin_seed": 0,
    "textures": [
        {"type": "solid", "color": [0.65, 0.05, 0.05]},
        {"type": "solid", "color": [0.73, 0.73, 0.73]},
        {"type": "solid", "color": [0.12, 0.45, 0.15]},
        {"type": "solid", "color": [15.0, 15.0, 15.0]},
    ],
    "materials": [
        {"type": "lambertian", "texture": 0},
        {"type": "lambertian", "texture": 1},
        {"type": "lambertian", "texture": 2},
        {"type": "light", "texture": 3},
        {"type": "dielectric", "ir": 1.5},
    ],
    "primitives": [
        {"type": "rect", "plane": "yz", "start": [555, 0, 0], "end": [555, 555, 555], "direction": -1, "material": 2},
        {"type": "rect", "plane": "yz", "start": [0, 0, 0], "end": [0, 555, 555], "direction": 1, "material": 0},
        {"type": "rect", "plane": "xz", "start": [0, 555, 0], "end": [555, 555, 555], "direction": -1, "material": 1},
        {"type": "rect", "plane": "xz", "start": [0, 0, 0], "end": [555, 0, 555], "direction": 1, "material": 1},
        {"type": "rect", "plane": "xz", "start": [213, 554, 227], "end": [343, 554, 332], "direction": -1, "material": 3},
        {"type": "rect", "plane": "xy", "start": [0, 0, 555], "end": [555, 555, 555], "direction": -1, "material": 1},
        {"type": "box", "start": [130, 0, 65], "end": [295, 165, 230], "material": 1},
        {"type": "box", "start": [265, 0, 295], "end": [430, 330, 460], "material": 1},
        {"type": "sphere", "center": [212.5, 255.0, 147.5], "radius": 90.0, "material": 4},
        {"type": "sphere", "center": [347.5, 420.0, 377.5], "radius": 90.0, "material": 4},
    ],
    "camera": {
        "type": "static", "lookfrom": [278, 278, -800], "lookat": [278, 278, 0],
        "up": [0, 1, 0], "vfov": 40.0, "aperture": 0.0, "focus_dist": 10.0,
    },
    "image": {
        "width": 400, "height": 400, "samples_per_pixel": 1000,
        "max_bounces": 20, "background": [0.0, 0.0, 0.0],
    },
}


def test_json_cornell_matches_builtin():
    """The JSON CornellBox must render EXACTLY like the code-built one
    (same SoA tables => same image bits)."""
    from rust_pathtracer_tpu.models import get_scene

    sd_json = scene_def_from_dict(CORNELL_DOC, name="cornell_json")
    sd_code = get_scene("CornellBox")
    assert sd_json.output.image == sd_code.output.image

    s = RenderSettings(24, 24, 4, 5, (0.0, 0.0, 0.0))
    key = jax.random.PRNGKey(2)
    a, _ = render_radiance(sd_json.build(), sd_json.camera_at(0.0), s, key)
    b, _ = render_radiance(sd_code.build(), sd_code.camera_at(0.0), s, key)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_json_file_roundtrip(tmp_path):
    p = os.path.join(tmp_path, "scene.json")
    with open(p, "w") as f:
        json.dump(CORNELL_DOC, f)
    sd = load_scene_json(p)
    assert sd.output.image.width == 400
    assert not sd.output.is_animation
    scene = sd.build()
    assert scene.num_prims == 20


def test_json_animation_and_orbit():
    doc = dict(CORNELL_DOC)
    doc["camera"] = {"type": "orbit", "radius": 12.0, "vfov": 20.0}
    doc["animation"] = {"fps": 30.0, "duration": 10.0}
    sd = scene_def_from_dict(doc)
    assert sd.output.is_animation and sd.output.num_frames == 300
    c0 = sd.camera_at(0.0)
    c1 = sd.camera_at(0.25)
    assert not np.allclose(np.asarray(c0.origin), np.asarray(c1.origin))


def test_json_checker_perlin_image_obj(tmp_path):
    from rust_pathtracer_tpu.scene.obj_loader import write_test_obj

    write_test_obj(os.path.join(tmp_path, "m.obj"))
    doc = {
        "textures": [
            {"type": "solid", "color": [0.2, 0.3, 0.1]},
            {"type": "solid", "color": [0.9, 0.9, 0.9]},
            {"type": "checker", "odd": 0, "even": 1},
            {"type": "perlin", "scale": 4.0},
            {"type": "image", "data": np.full((2, 2, 3), 0.5).tolist()},
        ],
        "materials": [
            {"type": "lambertian", "texture": 2},
            {"type": "lambertian", "texture": 3},
            {"type": "metal", "texture": 4, "fuzz": 0.1},
        ],
        "primitives": [
            {"type": "sphere", "center": [0, -1000, 0], "radius": 1000, "material": 0},
            {"type": "sphere", "center": [0, 2, 0], "radius": 2, "material": 1},
            {"type": "triangle", "p1": [0, 0, 0], "p2": [1, 0, 0], "p3": [0, 1, 0], "material": 2},
            {"type": "obj", "path": "m.obj"},
        ],
        "camera": {"type": "static", "lookfrom": [13, 2, 3], "lookat": [0, 0, 0],
                   "up": [0, 1, 0], "vfov": 20.0},
        "image": {"width": 16, "height": 16, "samples_per_pixel": 2,
                  "max_bounces": 3, "background": [1, 1, 1]},
    }
    p = os.path.join(tmp_path, "scene.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    sd = load_scene_json(p)
    scene = sd.build()
    assert scene.num_prims == 3 + 18
    img, _ = render_radiance(scene, sd.camera_at(0.0), sd.output.image, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(img)).all()


def test_cli_end_to_end(tmp_path):
    from rust_pathtracer_tpu.cli import main

    out = os.path.join(tmp_path, "out")
    rc = main([
        "--scene", "TwoSphereCheckers", "--width", "24", "--height", "16",
        "--spp", "2", "--max-bounces", "3", "--output-dir", out, "--quiet",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "image_0000.png"))


def test_cli_scene_json_and_mesh(tmp_path):
    from rust_pathtracer_tpu.cli import main

    p = os.path.join(tmp_path, "scene.json")
    with open(p, "w") as f:
        json.dump(CORNELL_DOC, f)
    out = os.path.join(tmp_path, "out")
    rc = main([
        "--scene-json", p, "--width", "16", "--height", "16", "--spp", "2",
        "--max-bounces", "3", "--output-dir", out, "--quiet", "--mesh", "4x2",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "image_0000.png"))


def test_cli_animation_gif(tmp_path):
    from rust_pathtracer_tpu.cli import main

    out = os.path.join(tmp_path, "anim")
    rc = main([
        "--scene", "SphereField", "--width", "16", "--height", "9", "--spp", "1",
        "--max-bounces", "2", "--frames", "3", "--gif", "--output-dir", out,
        "--quiet",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "image_0002.png"))
    assert os.path.exists(os.path.join(out, "animation.gif"))


def test_cli_list_scenes(capsys):
    from rust_pathtracer_tpu.cli import main

    assert main(["--list-scenes"]) == 0
    out = capsys.readouterr().out
    assert "CornellBox" in out and "SphereField" in out


def test_cli_mesh_regen_mutually_exclusive(tmp_path):
    """--mesh + --regen must error loudly: render_one's branch order
    would otherwise pick the sharded path and silently ignore --regen
    (round-3 review finding)."""
    import pytest

    from rust_pathtracer_tpu.cli import main

    with pytest.raises(SystemExit):
        main([
            "--scene", "CornellBox", "--width", "8", "--height", "8",
            "--spp", "2", "--mesh", "2x1", "--regen",
            "--output-dir", str(tmp_path), "--quiet",
        ])
