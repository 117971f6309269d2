from fermiflow_tpu.flow.cnf import CNF

__all__ = ["CNF"]
