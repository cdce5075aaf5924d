import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu import sampling
from rust_pathtracer_tpu.materials import _schlick, emitted, scatter
from rust_pathtracer_tpu.ops.intersect import closest_hit_brute, hit_record
from rust_pathtracer_tpu.scene.builder import SceneBuilder
from rust_pathtracer_tpu.textures import eval_texture

INF = 1e30


def _hit_scene(builder, o, d):
    scene = builder.build(use_bvh=False)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    hit, t, idx = closest_hit_brute(scene.prims, o, d, 1e-3, INF)
    rec = hit_record(scene.prims, idx, o, d, t, hit, scene.prim_types)
    return scene, rec, d


def _draws(n, seed=0):
    k = sampling.lane_keys(jax.random.PRNGKey(seed), jnp.arange(n, dtype=jnp.uint32))
    return (
        sampling.on_unit_sphere(sampling.bounce_keys(k, 0, sampling.P_LAMBERT)),
        sampling.in_unit_sphere(sampling.bounce_keys(k, 0, sampling.P_FUZZ)),
        sampling.uniform(sampling.bounce_keys(k, 0, sampling.P_SCHLICK)),
    )


def test_lambertian_scatters_cosine_and_attenuates():
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, b.lambertian((0.3, 0.6, 0.9)))
    n = 4000
    scene, rec, d = _hit_scene(
        b, np.tile([(0, 0, 0)], (n, 1)), np.tile([(0, 0, -1)], (n, 1))
    )
    sph, ball, coin = _draws(n)
    sc = scatter(scene, rec, d, sph, ball, coin)
    assert bool(sc.did_scatter.all())
    assert np.allclose(np.asarray(sc.attenuation), [0.3, 0.6, 0.9], atol=1e-6)
    # dir = normal + unit vector: all within 90deg of normal on average;
    # cosine-weighted -> mean cos(theta) = 2/3
    dirs = np.asarray(sc.direction)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    cos = dirs @ np.array([0.0, 0.0, 1.0])
    assert abs(cos.mean() - 2.0 / 3.0) < 0.02


def test_metal_absorbs_below_surface():
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, b.metal((0.8, 0.8, 0.8), 0.0))
    scene, rec, d = _hit_scene(b, [(0, 0, 0)], [(0, 0, -1)])
    sph, ball, coin = _draws(1)
    sc = scatter(scene, rec, d, sph, ball, coin)
    # head-on reflection points back along +z, above surface -> scatters
    assert bool(sc.did_scatter[0])
    assert np.allclose(np.asarray(sc.direction[0]), [0, 0, 1], atol=1e-5)


def test_metal_fuzz_perturbs():
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, b.metal((1, 1, 1), 0.5))
    n = 1000
    scene, rec, d = _hit_scene(
        b, np.tile([(0, 0, 0)], (n, 1)), np.tile([(0, 0, -1)], (n, 1))
    )
    sph, ball, coin = _draws(n, seed=1)
    sc = scatter(scene, rec, d, sph, ball, coin)
    dirs = np.asarray(sc.direction)
    spread = np.linalg.norm(dirs - np.array([0, 0, 1.0]), axis=-1)
    assert spread.max() <= 0.5 + 1e-5  # fuzz radius bound
    assert spread.mean() > 0.1


def test_dielectric_tir_and_straight_through():
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, b.dielectric(1.5))
    # head-on: cos=1 -> schlick = r0 = ((1-2/3)/(1+2/3))^2 = 0.04; most
    # lanes refract straight through
    n = 500
    scene, rec, d = _hit_scene(
        b, np.tile([(0, 0, 0)], (n, 1)), np.tile([(0, 0, -1)], (n, 1))
    )
    sph, ball, coin = _draws(n, seed=2)
    sc = scatter(scene, rec, d, sph, ball, coin)
    assert bool(sc.did_scatter.all())  # dielectric always scatters
    assert np.allclose(np.asarray(sc.attenuation), 1.0)  # material.rs:141
    dirs = np.asarray(sc.direction)
    refracted = dirs[:, 2] < 0
    # reflect fraction should be ~schlick(cos=1, ratio=1/1.5) = 0.04
    frac_reflect = 1.0 - refracted.mean()
    assert abs(frac_reflect - 0.04) < 0.04


def test_schlick_reference_value():
    # r0 + (1-r0)(1-cos)^5 with ratio quirk (material.rs:109-113)
    ratio = 1.0 / 1.5
    r0 = ((1 - ratio) / (1 + ratio)) ** 2
    got = float(_schlick(jnp.asarray(0.5), jnp.asarray(ratio)))
    assert np.isclose(got, r0 + (1 - r0) * 0.5**5, atol=1e-6)


def test_light_emits_front_face_only():
    b = SceneBuilder()
    b.add_rect("xz", (0, 1, 0), (1, 1, 1), -1.0, b.diffuse_light((4, 4, 4)))
    # from below: outward normal (0,-1,0); ray going up -> front -> emits
    scene, rec, d = _hit_scene(b, [(0.5, 0, 0.5), (0.5, 2, 0.5)], [(0, 1, 0), (0, -1, 0)])
    em = np.asarray(emitted(scene, rec))
    assert np.allclose(em[0], [4, 4, 4])
    assert np.allclose(em[1], [0, 0, 0])  # back face dark (material.rs:160-164)
    sph, ball, coin = _draws(2)
    sc = scatter(scene, rec, d, sph, ball, coin)
    assert not bool(sc.did_scatter.any())  # lights never scatter


def test_checker_texture_sign():
    b = SceneBuilder()
    odd = b.solid_texture((1, 0, 0))
    even = b.solid_texture((0, 1, 0))
    tex = b.checker_texture(odd, even)
    b.add_sphere((0, 0, 0), 1.0, b.lambertian(tex))
    scene = b.build(use_bvh=False)
    # sin(10*.05)^3 > 0 -> even; flip one axis -> odd (texture.rs:38-44)
    pts = jnp.asarray([[0.05, 0.05, 0.05], [-0.05, 0.05, 0.05]])
    tid = jnp.asarray([tex, tex])
    u = v = jnp.zeros(2)
    vals = np.asarray(eval_texture(scene.textures, tid, u, v, pts, scene.tex_types))
    assert np.allclose(vals[0], [0, 1, 0])
    assert np.allclose(vals[1], [1, 0, 0])


def test_perlin_marble_deterministic_and_bounded():
    b = SceneBuilder()
    tex = b.perlin_texture(4.0)
    b.add_sphere((0, 0, 0), 1.0, b.lambertian(tex))
    scene = b.build(use_bvh=False)
    pts = jnp.asarray(np.random.default_rng(0).uniform(-3, 3, (256, 3)), jnp.float32)
    tid = jnp.full(256, tex, jnp.int32)
    u = v = jnp.zeros(256)
    a = np.asarray(eval_texture(scene.textures, tid, u, v, pts, scene.tex_types))
    c = np.asarray(eval_texture(scene.textures, tid, u, v, pts, scene.tex_types))
    assert np.array_equal(a, c)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert a.std() > 0.05  # actually varies
    # grayscale
    assert np.allclose(a[:, 0], a[:, 1]) and np.allclose(a[:, 1], a[:, 2])


def test_image_texture_bilinear():
    b = SceneBuilder()
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = (1, 0, 0)  # top-left
    img[1, 1] = (0, 0, 1)  # bottom-right
    tex = b.image_texture(img)
    b.add_sphere((0, 0, 0), 1.0, b.lambertian(tex))
    scene = b.build(use_bvh=False)
    tid = jnp.asarray([tex, tex, tex])
    u = jnp.asarray([0.0, 1.0, 0.5])
    v = jnp.asarray([1.0, 0.0, 0.5])  # v=1 is top
    pts = jnp.zeros((3, 3))
    vals = np.asarray(eval_texture(scene.textures, tid, u, v, pts, scene.tex_types))
    assert np.allclose(vals[0], [1, 0, 0], atol=1e-6)
    assert np.allclose(vals[1], [0, 0, 1], atol=1e-6)
    assert np.allclose(vals[2], [0.25, 0, 0.25], atol=1e-6)  # bilinear center


def test_nested_checker_textures():
    """texture.rs:25-45 children are Box<dyn Texture> — a checker of
    checkers must evaluate each level's sine lattice independently."""
    import numpy as np
    from rust_pathtracer_tpu.scene.builder import SceneBuilder
    from rust_pathtracer_tpu.textures import eval_texture

    b = SceneBuilder()
    c_r = b.solid_texture((1.0, 0.0, 0.0))
    c_g = b.solid_texture((0.0, 1.0, 0.0))
    c_b = b.solid_texture((0.0, 0.0, 1.0))
    inner = b.checker_texture(c_r, c_g, frequency=10.0)
    outer = b.checker_texture(inner, c_b, frequency=3.0)
    b.add_sphere((0, 0, 0), 1.0, b.lambertian(outer))
    scene = b.build(use_bvh=False)
    assert scene.checker_depth == 2

    rng = np.random.default_rng(5)
    pts = rng.uniform(-2, 2, (256, 3)).astype(np.float32)
    tex_id = jnp.full((256,), outer, jnp.int32)
    got = np.asarray(eval_texture(
        scene.textures, tex_id, jnp.zeros(256), jnp.zeros(256),
        jnp.asarray(pts), scene.tex_types, checker_depth=scene.checker_depth,
    ))

    def ref_val(p):
        def sines(f):
            return np.prod(np.sin(np.float32(f) * p))
        if sines(3.0) < 0:        # outer odd -> inner checker
            return (1, 0, 0) if sines(10.0) < 0 else (0, 1, 0)
        return (0, 0, 1)          # outer even -> solid blue

    want = np.asarray([ref_val(p) for p in pts], np.float32)
    np.testing.assert_array_equal(got, want)


def test_nested_checker_through_trace():
    """End-to-end: a lambertian with a nested checker albedo shades
    with the resolved leaf color on the first bounce."""
    import numpy as np
    from rust_pathtracer_tpu.scene.builder import SceneBuilder
    from rust_pathtracer_tpu import sampling
    from rust_pathtracer_tpu.integrator import trace

    b = SceneBuilder()
    dark = b.solid_texture((0.0, 0.0, 0.0))
    lite = b.solid_texture((1.0, 1.0, 1.0))
    inner = b.checker_texture(dark, lite, frequency=7.0)
    outer = b.checker_texture(inner, dark, frequency=2.0)
    b.add_rect("xz", (-50, 0, -50), (50, 0, 50), 1.0, b.lambertian(outer))
    scene = b.build(use_bvh=False)
    assert scene.checker_depth == 2

    # straight-down rays over a grid; 1-bounce: radiance = albedo * bg
    n = 64
    rng = np.random.default_rng(3)
    xz = rng.uniform(-5, 5, (n, 2)).astype(np.float32)
    o = np.stack([xz[:, 0], np.full(n, 4.0, np.float32), xz[:, 1]], -1)
    d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (n, 1))
    keys = sampling.lane_keys(
        jax.random.PRNGKey(0), jnp.arange(n, dtype=jnp.uint32)
    )
    rad, _ = trace(scene, jnp.asarray(o), jnp.asarray(d), keys,
                   (1.0, 1.0, 1.0), max_bounces=2)
    rad = np.asarray(rad)

    def albedo(p):
        def sines(f):
            return np.prod(np.sin(np.float64(f) * p))
        if sines(2.0) < 0:
            return 0.0 if sines(7.0) < 0 else 1.0
        return 0.0

    hitp = o.copy(); hitp[:, 1] = 0.0
    want = np.asarray([albedo(p) for p in hitp], np.float32)
    # second bounce may add more light on white-albedo lanes; the
    # black-albedo lanes must be exactly black
    zero = want == 0.0
    assert np.all(rad[zero] == 0.0)
    assert np.all(rad[~zero] > 0.0)
