"""Re-expressions of the six reference DAGs as Spark-first pipelines
over fixture tables (behavior parity per SURVEY.md §2.1-2.9 citations;
HTTP replaced by injected source DataFrames)."""

from .reference import (  # noqa: F401
    build_airflow_cleanup,
    build_backups,
    build_cloudflare_apps,
    build_cloudflare_ddns,
    build_dns_requests,
    build_speedtest,
)
