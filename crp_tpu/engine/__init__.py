from .rowpara import RowParaSpmm
from .para2d import Para2dSpmm

__all__ = ["RowParaSpmm", "Para2dSpmm"]
