"""Device block codec glue: host token parse + on-chip reconstruction.

This is the single-block device path (SURVEY.md §7 step 4: one stream
compressed/decompressed on TPU). The multi-block sharded engine lives in
parallel/pipeline.py.
"""

from __future__ import annotations

import numpy as np

from .format import FormatError
from .kernels import decode_tokens as K


def decode_block_device(payload: bytes, ext: bool, *,
                        interpret: bool = False,
                        n_chunks: int | None = None) -> bytes:
    """Decode one block payload with the Pallas reconstruction kernel.

    Phase A (token parse) runs on host via the native tokenizer; phase B
    (all byte movement) runs on-device.
    """
    from .runtime import native

    dst, src, ln, lit, size = native.tokenize_block(payload, ext)
    if n_chunks is None:
        n_chunks = K.n_chunks_for_tokens(len(dst))
    tok_a, tok_b = K.pack_tokens(dst, src, ln, lit, n_chunks)
    words = K.decode_tokens_batch(
        K.pack_payload_words(payload)[None], tok_a[None], tok_b[None],
        interpret=interpret)
    out = K.words_to_bytes(words[0], size)
    if len(out) != size:
        raise FormatError("device decode size mismatch")
    return out


def decode_block_reference_tokens(payload: bytes, ext: bool) -> bytes:
    """Pure-numpy token replay (used to validate the tokenizer contract)."""
    from .runtime import native

    dst, src, ln, lit, size = native.tokenize_block(payload, ext)
    out = np.zeros(size + 80, dtype=np.uint8)
    pay = np.frombuffer(payload, dtype=np.uint8)
    pay = np.concatenate([pay, np.zeros(64, np.uint8)])
    for d, s, l, is_lit in zip(dst, src, ln, lit):
        if is_lit:
            out[d:d + l] = pay[s:s + l]
        else:
            out[d:d + l] = out[s:s + l]
    return out[:size].tobytes()
