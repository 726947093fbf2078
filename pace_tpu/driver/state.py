"""DriverState: everything the driver steps and saves.

Analogue of ai2cm/pace driver/pace/driver/state.py `DriverState` (the
TPU-native version holds plain pytrees rather than Quantity storages).
"""

from __future__ import annotations

import dataclasses
from datetime import datetime
from typing import Any, Optional


@dataclasses.dataclass
class DriverState:
    dycore_state: Any
    grid_data: Any
    sizing: Any
    time: Optional[datetime] = None
