"""Utilities: data loading, performance measurement, logging."""

from two_pass_lanczos_tpu.utils.data_loader import (
    DataLoaderError,
    parse_dmx,
    parse_qfc,
    load_kkt_arrays,
)
from two_pass_lanczos_tpu.utils.perf import (
    get_peak_rss_kb,
    device_memory_stats,
    Timer,
)

__all__ = [
    "DataLoaderError",
    "parse_dmx",
    "parse_qfc",
    "load_kkt_arrays",
    "get_peak_rss_kb",
    "device_memory_stats",
    "Timer",
]
