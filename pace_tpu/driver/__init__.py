from pace_tpu.driver.driver import Driver, DriverConfig  # noqa: F401
from pace_tpu.driver.initialization import (  # noqa: F401
    BaroclinicInit,
    InitializerSelector,
    RestartInit,
)
from pace_tpu.driver.performance import PerformanceConfig  # noqa: F401
from pace_tpu.driver.safety_checks import SafetyChecker  # noqa: F401
