"""Failure notification (O9): pluggable notifier with templated body.

Reference analog: Apprise on-failure callback with a Jinja-ish template
(`AppriseNotifier(body="The dag {{ dag.dag_id }} failed")`,
dags/DNS_Requests.py:34-40 — repeated in all 6 DAGs). Here the template
is a ``str.format`` over the run context; transports are pluggable
(log, collecting for tests, webhook adapters later).
"""

from __future__ import annotations

import logging
from typing import Protocol

logger = logging.getLogger("airflow_spark.notifier")

DEFAULT_TEMPLATE = "The pipeline {pipeline} failed (run {run_id}): {error}"


class Notifier(Protocol):
    def notify(self, context: dict) -> None: ...


class LogNotifier:
    """Default transport: structured log line."""

    def __init__(self, template: str = DEFAULT_TEMPLATE):
        self.template = template

    def notify(self, context: dict) -> None:
        logger.error(self.template.format(**context))


class CollectingNotifier:
    """Test transport: records every notification."""

    def __init__(self, template: str = DEFAULT_TEMPLATE):
        self.template = template
        self.messages: list[str] = []
        self.contexts: list[dict] = []

    def notify(self, context: dict) -> None:
        self.contexts.append(context)
        self.messages.append(self.template.format(**context))
