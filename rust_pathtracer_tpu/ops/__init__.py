from rust_pathtracer_tpu.ops.intersect import (
    HitRecord,
    T_MISS,
    aabb_hit,
    closest_hit,
    closest_hit_brute,
    hit_record,
    prim_intersect_t,
)
from rust_pathtracer_tpu.ops.bvh_traverse import closest_hit_bvh

__all__ = [
    "HitRecord",
    "T_MISS",
    "aabb_hit",
    "closest_hit",
    "closest_hit_brute",
    "closest_hit_bvh",
    "hit_record",
    "prim_intersect_t",
]
