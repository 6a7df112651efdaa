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


def _resolve(backend: str, warn_tpu_compress: bool = False) -> str:
    if backend == "auto":
        return "native" if _native_available() else "oracle"
    if backend not in ("oracle", "native", "tpu"):
        raise ValueError(f"unknown backend: {backend!r}")
    if backend == "tpu" and warn_tpu_compress:
        # measured on v5e (BASELINE.md): device-resident emission runs
        # ~26-30 MB/s/chip vs ~300 MB/s for the host MT path — the scalar
        # unit cannot absorb LZ emission. Don't let an explicit
        # --backend tpu silently cost 10x on the encode side.
        import warnings

        warnings.warn(
            "backend='tpu' compression is currently much slower than the "
            "native host path (~26 vs ~300 MB/s per chip/core measured); "
            "use backend='auto' unless you need device-resident encode",
            RuntimeWarning, stacklevel=3)
    return backend


def compress(data: bytes, ext: bool = True, backend: str = "auto",
             level: int = 0, dictionary: bytes = None,
             progress=None) -> bytes:
    """Compress bytes into a .tsq container.

    ``level`` selects the parse: 0 reproduces the upstream greedy parse
    bit-for-bit (the upstream plumbs the flag but never reads it,
    SURVEY.md §5); >=1 uses the exact candidate parse (better ratio).
    ``dictionary`` (framework extension, <=64 KiB) supplies shared context
    virtually preceding every block; both ends must use the same one.
    """
    b = _resolve(backend, warn_tpu_compress=True)
    if dictionary is not None:
        if b == "oracle":
            raise NotImplementedError(
                "dictionary mode needs the native or tpu backend")
        if b == "native":
            from . import native

            return native.compress_dict(data, dictionary, ext,
                                        level=max(level, 1),
                                        progress=progress)
        from ..parallel import pipeline

        return pipeline.compress(data, ext, level=max(level, 1),
                                 dictionary=dictionary, progress=progress)
    if b == "oracle":
        from .. import reference_codec

        return reference_codec.compress(data, ext)
    if b == "native":
        from . import native

        return native.compress(data, ext, level=level, progress=progress)
    from ..parallel import pipeline

    return pipeline.compress(data, ext, level=level, progress=progress)


def decompress(stream: bytes, backend: str = "auto",
               dictionary: bytes = None, progress=None) -> bytes:
    """Decompress a .tsq (or TSQX serving-profile) container."""
    if len(stream) >= 4 and stream[:4] == b"TSQX":
        # TSQX: pre-resolved gang planes (framework serving profile);
        # decodes on the device mesh with zero host resolution
        from .. import tsqx

        if dictionary is not None:
            raise FormatError("TSQX containers embed their context; "
                              "dictionary does not apply")
        return tsqx.decompress(stream)
    if len(stream) < 16 or stream[:4] != b"TSQ1":
        raise FormatError("not a TSQ1 stream")
    b = _resolve(backend)
    if dictionary is not None:
        if b == "tpu":
            from ..parallel import pipeline

            return pipeline.decompress(stream, dictionary=dictionary,
                                       progress=progress)
        if b == "oracle":
            from .. import reference_codec

            return reference_codec.decompress(stream, dictionary=dictionary)
        from . import native

        return native.decompress_dict(stream, dictionary,
                                      progress=progress)
    if b == "oracle":
        from .. import reference_codec

        return reference_codec.decompress(stream)
    if b == "native":
        from . import native

        return native.decompress(stream, progress=progress)
    from ..parallel import pipeline

    return pipeline.decompress(stream, progress=progress)
