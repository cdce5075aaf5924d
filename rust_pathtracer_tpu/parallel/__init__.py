from rust_pathtracer_tpu.parallel.mesh import make_mesh, distributed_init
from rust_pathtracer_tpu.parallel.shard import render_radiance_sharded

__all__ = ["make_mesh", "distributed_init", "render_radiance_sharded"]
