"""Structured Streaming operator coverage — filled in incrementally;
see streaming/."""

from __future__ import annotations
