"""Native (C++) runtime components.

`loader` — multi-threaded libjpeg decode + crop + letterbox (the
host-side half of the input pipeline, SURVEY §2b N3). Built on first use
with g++; every call falls back to the Python/OpenCV path when the
toolchain, libjpeg, or a particular file format is unavailable.
"""

from sm3x.native.loader import (
    native_loader_available,
    decode_letterbox_batch,
)

__all__ = ["native_loader_available", "decode_letterbox_batch"]
