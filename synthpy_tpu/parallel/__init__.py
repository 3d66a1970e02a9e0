"""Device-mesh sharding and distributed execution."""

from synthpy_tpu.parallel.mesh import (  # noqa: F401
    grid_ray_mesh,
    make_gridsharded_segment_tracer,
    make_gridsharded_tracer,
    ray_mesh,
    replicate,
    shard_rays,
    sharded_histogram,
)
from synthpy_tpu.parallel.pipeline_pp import (  # noqa: F401
    make_pipelined_segment_tracer,
)
