from .harness import (
    REFERENCE_GPU_SPEEDUP,
    REFERENCE_SEEDS,
    BenchResult,
    bench_cpu_native,
    bench_tpu,
    time_to_tolerance,
)
from .scaling import bench_sharded, scaling_sweep
