from fermiflow_tpu.utils.metrics import MetricsLogger
from fermiflow_tpu.utils.checkpointing import save_checkpoint, restore_checkpoint
from fermiflow_tpu.utils.profiling import trace, PhaseTimer

__all__ = [
    "MetricsLogger",
    "save_checkpoint",
    "restore_checkpoint",
    "trace",
    "PhaseTimer",
]
