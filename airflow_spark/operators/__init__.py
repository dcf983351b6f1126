"""LLM-data-pipeline operators: dedup, similarity search, text
analysis, multimodal columns. See registry.py for the driver-facing
query entries."""

from . import dedup, multimodal, similarity, text  # noqa: F401
