"""Pipeline engine: DAG-of-tasks orchestration over Spark computations.

The Spark-first re-expression of the reference's Airflow surface
(SURVEY.md §2.9): pipelines are declarative task graphs whose nodes are
Spark jobs; a thin driver handles scheduling, retries, timeouts,
expectations, and failure notification — all heavy data semantics stay
in Catalyst.
"""

from .core import Context, Pipeline, PipelineRun, TaskFailure  # noqa: F401
from .expectations import (  # noqa: F401
    ExpectationFailed,
    expect_empty,
    expect_nonempty,
    expect_schema,
    expect_that,
)
from .core import Param  # noqa: F401
from .health import health  # noqa: F401
from .notifier import CollectingNotifier, LogNotifier  # noqa: F401
from .scheduler import Scheduler, backfill, cron_matches, next_fire  # noqa: F401
from .state import RunStateStore  # noqa: F401
from .api import ControlPlane  # noqa: F401
