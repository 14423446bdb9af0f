from .accurate import compensated_dot, compensated_norm_sq
from .roofline import HBM_BW_GBPS, TrafficModel, traffic_model
