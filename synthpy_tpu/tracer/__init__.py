"""Ray tracing: beam initialisation and the RK4 propagator."""

from synthpy_tpu.tracer.beam import BEAM_TYPES, Beam, init_beam  # noqa: F401
from synthpy_tpu.tracer.zscan import (  # noqa: F401
    build_segment_pack_streaming,
    decimate_segment_pack,
    make_device_segment_cache,
    make_segment_pack,
    make_zscan_pack,
    quantize_segment_pack,
    solve_zscan,
    solve_zscan_segments,
    solve_zscan_segments_streamed,
)
from synthpy_tpu.tracer.adaptive import solve_adaptive  # noqa: F401
from synthpy_tpu.tracer.analytic import solve_zscan_analytic  # noqa: F401
from synthpy_tpu.tracer.propagator import (  # noqa: F401
    TraceResult,
    back_propagate,
    default_n_steps,
    ray_to_Jonesvector,
    solve,
    trace_rk4,
)
