"""Experiment tracking (file-based MLflow replacement)."""

from dlsc_tpu.tracking.tracker import Tracker

__all__ = ["Tracker"]
