from tti.measure.ops import (
    fabric_lower_envelope,
    kmeans_1d_two_clusters,
    masked_median,
    sample_envelope,
    stitch_stats,
)
from tti.measure.pipeline import (
    FrameMeasurement,
    MeasureParams,
    MeasureState,
    init_measure_state,
    measure_frame,
    smooth_measurement,
)

__all__ = [
    "fabric_lower_envelope",
    "kmeans_1d_two_clusters",
    "masked_median",
    "sample_envelope",
    "stitch_stats",
    "FrameMeasurement",
    "MeasureParams",
    "MeasureState",
    "init_measure_state",
    "measure_frame",
    "smooth_measurement",
]
