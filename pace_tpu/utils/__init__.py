from pace_tpu.utils import constants
from pace_tpu.utils.gridtools import GridSizing
from pace_tpu.utils.quantity import Quantity, QuantityFactory
from pace_tpu.utils.timing import Timer, NullTimer

__all__ = [
    "constants", "GridSizing", "Quantity", "QuantityFactory", "Timer",
    "NullTimer",
]
