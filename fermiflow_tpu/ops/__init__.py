from fermiflow_tpu.ops.logdet import logabsdet

__all__ = ["logabsdet"]
