from datasketch_tpu.utils.health import HealthMonitor, device_healthcheck
from datasketch_tpu.utils.pipeline import stream_batches
from datasketch_tpu.utils.profiling import device_sync, time_op, trace

__all__ = [
    "trace",
    "time_op",
    "device_sync",
    "stream_batches",
    "device_healthcheck",
    "HealthMonitor",
]
