"""Data layer: prep, fold datamodules, host loader, device pipelines.

Host side stays thin (mmap'd fold shards + a prefetching batch iterator);
all DSP and augmentation runs on device (dlsc_tpu.ops) inside the jitted
train step — the TPU-first restructuring of the reference's per-item
DataLoader pipeline (SURVEY.md §3.1 hot-loop note).
"""

from dlsc_tpu.data.datamodule import ESC50DataModule, US8KDataModule
from dlsc_tpu.data.pipeline import DevicePipeline

__all__ = ["ESC50DataModule", "US8KDataModule", "DevicePipeline"]
