from data_profiler_spark.plans.manifest import Manifest  # noqa: F401
from data_profiler_spark.plans.runner import RunResult, ValidationRun  # noqa: F401
