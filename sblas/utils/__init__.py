from .timing import measure_seconds_per_iter, stream_bandwidth, BenchRecord

__all__ = ["measure_seconds_per_iter", "stream_bandwidth", "BenchRecord"]
