from schwingermodel_tpu.solvers.cg import CGResult, cg_solve

__all__ = ["CGResult", "cg_solve"]
