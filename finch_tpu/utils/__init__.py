from finch_tpu.utils.metrics import (Meter, get_meter, metrics_enabled,
                                     report, trace)

__all__ = ["Meter", "get_meter", "metrics_enabled", "report", "trace"]
