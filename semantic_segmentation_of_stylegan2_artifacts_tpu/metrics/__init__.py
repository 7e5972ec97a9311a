from .segmentation import (  # noqa: F401
    CaseMetrics,
    MetricsAggregator,
    case_metrics,
    compute_case_metrics_jit,
)
from .csv_logger import CSVHandler  # noqa: F401
