from meshopticalflow_tpu.flow.signal import SmoothingOperators, make_smoothing_operators, smooth_signal
from meshopticalflow_tpu.flow.pipeline import FlowProblem, FlowResult
