"""Public blocking compress/decompress API with backend dispatch.

Backends:
  * ``oracle`` — pure-Python exact codec (slow; the executable spec).
  * ``native`` — C++ multithreaded core via ctypes (host production path,
    the equivalent of tsqCompress_MT/tsqDecompress_MT).
  * ``tpu``    — JAX device pipeline (blocks sharded over the mesh).
  * ``auto``   — best available: native if built, else oracle.
"""

from __future__ import annotations

from ..format import FormatError


def _native_available() -> bool:
    try:
        from . import native

        return native.available()
    except Exception:
        return False


def _resolve(backend: str) -> str:
    if backend == "auto":
        return "native" if _native_available() else "oracle"
    if backend not in ("oracle", "native", "tpu"):
        raise ValueError(f"unknown backend: {backend!r}")
    return backend


def compress(data: bytes, ext: bool = True, backend: str = "auto",
             level: int = 0) -> bytes:
    """Compress bytes into a .tsq container.

    ``level`` is accepted for CLI/API parity with the reference
    (turbosqueeze.h:508) and is currently a no-op there as well
    (SURVEY.md §5: plumbed end-to-end but never read by the codec).
    """
    b = _resolve(backend)
    if b == "oracle":
        from .. import reference_codec

        return reference_codec.compress(data, ext)
    if b == "native":
        from . import native

        return native.compress(data, ext, level=level)
    from ..parallel import pipeline

    return pipeline.compress(data, ext, level=level)


def decompress(stream: bytes, backend: str = "auto") -> bytes:
    """Decompress a .tsq container back to the original bytes."""
    if len(stream) < 16 or stream[:4] != b"TSQ1":
        raise FormatError("not a TSQ1 stream")
    b = _resolve(backend)
    if b == "oracle":
        from .. import reference_codec

        return reference_codec.decompress(stream)
    if b == "native":
        from . import native

        return native.decompress(stream)
    from ..parallel import pipeline

    return pipeline.decompress(stream)
