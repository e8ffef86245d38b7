from matchmaker_tpu.obs.perf_monitor import PerformanceMonitor

__all__ = ["PerformanceMonitor"]
