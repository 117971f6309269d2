from fermiflow_tpu.utils.metrics import MetricsLogger
from fermiflow_tpu.utils.checkpointing import save_checkpoint, restore_checkpoint

__all__ = ["MetricsLogger", "save_checkpoint", "restore_checkpoint"]
