"""Readers and sinks for the docket pipeline."""

from . import readers, sinks

__all__ = ["readers", "sinks"]
