"""Utilities: run logging, metrics, profiling, numerical health."""

from .logging import MetricsWriter, make_logger, setup_run_dir
from .profiling import (
    enable_nan_debugging,
    honor_cpu_request,
    is_tpu,
    timed,
    trace,
    tree_health,
)

__all__ = [
    "MetricsWriter",
    "make_logger",
    "setup_run_dir",
    "enable_nan_debugging",
    "honor_cpu_request",
    "is_tpu",
    "timed",
    "trace",
    "tree_health",
]
