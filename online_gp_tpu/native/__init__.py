from online_gp_tpu.native.loader import (
    native_available,
    fast_csv_read,
    BatchStream,
)

__all__ = ["native_available", "fast_csv_read", "BatchStream"]
