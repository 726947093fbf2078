from pace_tpu.models.fv3.config import DynamicalCoreConfig  # noqa: F401
from pace_tpu.models.fv3.state import DycoreState  # noqa: F401
