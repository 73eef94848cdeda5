from datasketch_tpu.utils.profiling import device_sync, time_op, trace

__all__ = ["trace", "time_op", "device_sync"]
