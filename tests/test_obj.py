import os

import numpy as np
import pytest

from rust_pathtracer_tpu.scene.builder import SceneBuilder
from rust_pathtracer_tpu.scene.obj_loader import load_obj_into, parse_mtl, write_test_obj
from rust_pathtracer_tpu.scene.types import (
    MAT_DIELECTRIC,
    MAT_LAMBERTIAN,
    MAT_METAL,
    PRIM_TRIANGLE,
)


@pytest.fixture()
def obj_path(tmp_path):
    p = os.path.join(tmp_path, "model.obj")
    write_test_obj(p)
    return p


def test_load_counts_and_types(obj_path):
    b = SceneBuilder()
    n = load_obj_into(b, obj_path)
    # pyramid: 4 tris + quad base (2) = 6; cube: 6 quads = 12
    assert n == 18
    scene = b.build(use_bvh=False)
    assert int((np.asarray(scene.prims.kind) == PRIM_TRIANGLE).sum()) == 18


def test_mtl_material_mapping(obj_path):
    # illum 2 -> lambertian, illum 5 -> metal fuzz=1/Ns, illum 7 -> dielectric Ni
    b = SceneBuilder()
    load_obj_into(b, obj_path)
    scene = b.build(use_bvh=False)
    kinds = np.asarray(scene.materials.kind)
    fuzz = np.asarray(scene.materials.fuzz)
    ir = np.asarray(scene.materials.ir)
    assert MAT_LAMBERTIAN in kinds and MAT_METAL in kinds and MAT_DIELECTRIC in kinds
    mi = int(np.flatnonzero(kinds == MAT_METAL)[0])
    assert np.isclose(fuzz[mi], 1.0 / 50.0)  # obj_model.rs:40
    di = int(np.flatnonzero(kinds == MAT_DIELECTRIC)[0])
    assert np.isclose(ir[di], 1.5)  # obj_model.rs:33


def test_missing_material_default(tmp_path):
    p = os.path.join(tmp_path, "plain.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    b = SceneBuilder()
    load_obj_into(b, p)
    scene = b.build(use_bvh=False)
    # lambertian (0.2, 0.7, 0.2) (obj_model.rs:82-84)
    mid = int(np.asarray(scene.prims.mat)[0])
    tid = int(np.asarray(scene.materials.tex)[mid])
    assert np.allclose(np.asarray(scene.textures.color)[tid], [0.2, 0.7, 0.2])


def test_vertex_normals_used(tmp_path):
    p = os.path.join(tmp_path, "n.obj")
    with open(p, "w") as f:
        f.write(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "vn 0 0.70710678 0.70710678\n"
            "f 1//1 2//1 3//1\n"
        )
    b = SceneBuilder()
    load_obj_into(b, p)
    scene = b.build(use_bvh=False)
    n = np.asarray(scene.prims.data)[0, 9:12]
    # first vertex's OBJ normal, not the geometric (0,0,1) (obj_model.rs:87-96)
    assert np.allclose(n, [0.0, 0.70710678, 0.70710678], atol=1e-6)


def test_negative_indices_and_fan(tmp_path):
    p = os.path.join(tmp_path, "neg.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n")
    b = SceneBuilder()
    n = load_obj_into(b, p)
    assert n == 2  # quad fan-triangulated


def test_parse_mtl(tmp_path):
    p = os.path.join(tmp_path, "m.mtl")
    with open(p, "w") as f:
        f.write("newmtl a\nKd 0.1 0.2 0.3\nNs 25\nNi 1.33\nillum 5\n")
    m = parse_mtl(p)
    # values round through f32 like the reference's tobj f32 fields
    # (obj_model.rs:34-46) and the C++ parser's float fields
    f32 = lambda x: float(np.float32(x))  # noqa: E731
    assert m["a"]["kd"] == (f32(0.1), f32(0.2), f32(0.3))
    assert m["a"]["ns"] == 25.0
    assert m["a"]["ni"] == f32(1.33)
    assert m["a"]["illum"] == 5


def test_benchmark_obj_scale_and_winding(tmp_path):
    from rust_pathtracer_tpu.scene.obj_loader import (
        parse_obj_arrays,
        write_benchmark_obj,
    )

    p = str(tmp_path / "rock.obj")
    n = write_benchmark_obj(p)
    assert n >= 10000
    tris, normals, *_ = parse_obj_arrays(p)
    assert tris.shape == (n, 3, 3)
    # every face wound outward (the one-sided cull, geometry.rs:526,
    # must not hide the surface): geometric normal points away from
    # the body center
    geo = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    out = tris.mean(1) - np.array([0.0, 1.5, 0.0])
    assert ((geo * out).sum(-1) > 0).all()
    # smooth normals broadly agree with geometry
    agree = (geo * normals).sum(-1)
    assert (agree > 0).mean() > 0.99


def _both_parsers(path):
    """(native, python-fallback) parse_obj_arrays results."""
    from rust_pathtracer_tpu.scene.obj_loader import parse_obj_arrays

    a = parse_obj_arrays(path, prefer_native=True)
    b = parse_obj_arrays(path, prefer_native=False)
    return a, b


def test_obj_edge_cases_native_python_parity(tmp_path):
    """Review-found divergences (round 2): usemtl before its mtllib,
    duplicate material names across mtllib files, out-of-range vertex
    indices, and forward-referenced vn lines must parse IDENTICALLY in
    the C++ parser and the python oracle — with the reference's
    semantics (usemtl binds at the use site against materials loaded
    so far; re-declared names rebind; bad triangles drop; normals are
    position-indexed against the final vn array)."""
    ma = os.path.join(tmp_path, "a.mtl")
    mb = os.path.join(tmp_path, "b.mtl")
    with open(ma, "w") as f:
        f.write("newmtl red\nKd 1 0 0\nillum 2\n")
    with open(mb, "w") as f:
        f.write("newmtl red\nKd 0 0 1\nillum 2\n")
    p = os.path.join(tmp_path, "e.obj")
    with open(p, "w") as f:
        f.write(
            "usemtl red\n"            # before any mtllib -> -1
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 9 9 9\n"
            "f 1 2 3\n"               # unmateria-1ed face
            "mtllib a.mtl\nusemtl red\nf 1 2 3\n"   # first 'red'
            "mtllib b.mtl\nf 1 2 3\n"  # still bound to FIRST red
            "usemtl red\nf 1 2 3\n"    # rebinds to second 'red'
            "f 1 2 99\n"               # OOB index -> dropped
            "f -9 1 2\n"               # OOB negative -> dropped
            "vn 0 0 1\n"               # forward-referenced vn
        )
    (va, na, ha, mia, mata), (vb, nb, hb, mib, matb) = _both_parsers(p)
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(na, nb)
    np.testing.assert_array_equal(ha, hb)
    np.testing.assert_array_equal(mia, mib)
    assert len(mata) == len(matb) == 2
    for x, y in zip(mata, matb):
        assert x["kd"] == y["kd"] and x["illum"] == y["illum"]
    # semantics: -1, first red (kd 1,0,0), STILL first red, second red
    assert mia.tolist() == [-1, 0, 0, 1]
    assert mata[0]["kd"][0] == 1.0 and mata[1]["kd"][2] == 1.0
    # the forward-referenced vn applies to every face (position index
    # 0 < 1 vn), per the reference's end-of-parse mesh construction
    assert ha.all()
    np.testing.assert_allclose(na, [[0, 0, 1]] * 4)


def test_obj_ns_zero_metal_inf_fuzz(tmp_path):
    """illum 5 with Ns 0 must load (reference: fuzz = 1/0 = inf,
    obj_model.rs:40), not crash with ZeroDivisionError."""
    import math

    from rust_pathtracer_tpu.scene.builder import SceneBuilder

    ma = os.path.join(tmp_path, "z.mtl")
    with open(ma, "w") as f:
        f.write("newmtl m\nKd 0.5 0.5 0.5\nNs 0\nillum 5\n")
    p = os.path.join(tmp_path, "z.obj")
    with open(p, "w") as f:
        f.write("mtllib z.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
                "usemtl m\nf 1 2 3\n")
    b = SceneBuilder()
    load_obj_into(b, p)
    assert math.isinf(float(b._mat_fuzz[-1]))
