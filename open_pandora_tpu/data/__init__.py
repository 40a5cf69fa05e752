"""Host-side input pipeline: WebVid dataset, synthetic fallback, threaded
prefetch loader with per-host sharding."""

from open_pandora_tpu.data.webvid import (PrefetchLoader, SyntheticVideoDataset,  # noqa: F401
                                          WebVidDataset)
