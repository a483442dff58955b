"""Native (C++) host runtime: threaded mmap clip loader + keyed-protocol
sampler facades the training runner consumes (config data_loader='native')."""
from .native import (
    NativeClipLoader,
    NativeClipSampler,
    NativeImageSampler,
    build_library,
)

__all__ = [
    "NativeClipLoader",
    "NativeClipSampler",
    "NativeImageSampler",
    "build_library",
]
