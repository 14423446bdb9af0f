from .accurate import compensated_dot, compensated_norm_sq
from .profiling import profile_solve, trace
from .roofline import HBM_BW_GBPS, TrafficModel, traffic_model
