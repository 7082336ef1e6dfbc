"""Observability: metric logging, segmentation image logging, perf profiling.

Counterpart of the reference's W&B surface (component #25) and performance
profiler (component #26), with a local JSONL fallback so runs are fully
observable without network access.
"""

from .logging import MetricLogger, make_logger
from .profiler import count_params, performance_metrics
from .summary import flop_count_table, flops_and_params, model_summary_table

__all__ = [
    "MetricLogger",
    "make_logger",
    "count_params",
    "performance_metrics",
    "flops_and_params",
    "model_summary_table",
    "flop_count_table",
]
