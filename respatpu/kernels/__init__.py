from . import spmv

__all__ = ["spmv"]
