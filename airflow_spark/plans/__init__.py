"""Physical-plan inspection helpers."""

from .audit import audit_plan, explain_str  # noqa: F401
from .lineage import affected_columns, column_lineage  # noqa: F401
from .lint import assert_clean, lint_plan  # noqa: F401
from .stats import (  # noqa: F401
    broadcast_if_small,
    estimated_size_bytes,
    should_broadcast,
)
