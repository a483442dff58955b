"""Native (C++) host runtime: threaded mmap clip loader."""
from .native import NativeClipLoader, build_library

__all__ = ["NativeClipLoader", "build_library"]
