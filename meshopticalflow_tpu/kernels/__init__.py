from meshopticalflow_tpu.kernels.tracing import (
    TraceMesh,
    make_trace_mesh,
    flow_field_trace,
    flow_field_trace_distance,
    gradient_flow_trace,
    whitney_flow_trace,
    exp_map,
)
from meshopticalflow_tpu.kernels.advect import (
    resample_signal,
    advect_texture,
    advect_texture_step,
    advect_texture_compacted,
    advect_texture_frames_scan,
    flow_field_trace_pairs,
    resample_signal_composed_whitney,
    sample_texture_bilinear,
    sample_vertex_signal,
)
from meshopticalflow_tpu.kernels.pallas_spmv import (
    BlockEllPattern,
    PallasEll,
    pack_pattern,
    resolve_flow_backend,
    spmv_tiles,
    spmv_tiles_multi,
)
