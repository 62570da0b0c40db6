from online_gp_tpu.logging.csv_logger import CSVLogger
from online_gp_tpu.logging.timing import Timer

__all__ = ["CSVLogger", "Timer"]
