"""Physical-plan inspection helpers."""

from .audit import audit_plan, explain_str  # noqa: F401
