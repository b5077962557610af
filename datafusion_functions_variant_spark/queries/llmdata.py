"""LLM-training-data pipeline operators (dedup, similarity, text
analysis, multimodal) — filled in incrementally; see operators/."""

from __future__ import annotations
