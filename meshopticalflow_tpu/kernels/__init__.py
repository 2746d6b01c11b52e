from meshopticalflow_tpu.kernels.tracing import (
    TraceMesh,
    make_trace_mesh,
    flow_field_trace,
    whitney_flow_trace,
    exp_map,
)
from meshopticalflow_tpu.kernels.advect import (
    resample_signal,
    advect_texture,
    advect_texture_step,
    sample_texture_bilinear,
    sample_vertex_signal,
)
