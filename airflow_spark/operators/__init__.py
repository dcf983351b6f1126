"""LLM-data-pipeline operators: dedup, similarity search, text
analysis, corpus curation, time-series, multimodal columns. See
registry.py for the driver-facing query entries."""

from . import (  # noqa: F401
    curation,
    dedup,
    multimodal,
    similarity,
    text,
    timeseries,
)
