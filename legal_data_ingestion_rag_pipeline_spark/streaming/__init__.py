"""Structured Streaming seam (SURVEY §2.7)."""

from . import pipeline

__all__ = ["pipeline"]
