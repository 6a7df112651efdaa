"""Container/block header format tests (reference: turbosqueeze.cpp:64-84)."""

import pytest

from turbosqueeze_tpu import format as fmt


def test_constants():
    assert fmt.BLOCK_SZ == 1 << 22
    assert fmt.OUTPUT_SZ == (1 << 22) + (1 << 20)
    assert fmt.HASH_ENTRIES == 1 << 17
    assert fmt.HASH_MASK == (1 << 17) - 1
    assert fmt.EXT_FLAG == 0x800000


def test_mlen_table():
    # spot values from the derived spec of tsq_encode.cpp:44-45
    t = fmt.MLEN_TABLE
    assert t[4] == 3 and t[16] == 15 and t[17] == 15 and t[31] == 15
    assert t[32] == 0 and t[47] == 0 and t[48] == 1 and t[63] == 1 and t[64] == 2
    # every emitted code's decode width must be <= the true match length
    for k in range(4, 65):
        code = t[k]
        width = {0: 32, 1: 48, 2: 64}.get(code, code + 1)
        assert width <= k
        assert fmt.code_to_advance(code) == width


def test_container_header_roundtrip():
    h = fmt.ContainerHeader(n_blocks=3, total_size=10_000_000)
    packed = h.pack()
    assert len(packed) == fmt.CONTAINER_HEADER_SZ
    assert packed[:4] == b"TSQ1"
    assert fmt.ContainerHeader.unpack(packed) == h


def test_container_header_bad_magic():
    with pytest.raises(fmt.FormatError):
        fmt.ContainerHeader.unpack(b"NOPE" + bytes(12))


def test_block_header_roundtrip():
    for size, ext in [(1, False), (12345, True), (fmt.BLOCK_PAYLOAD_MASK, True)]:
        data = fmt.pack_block_header(size, ext)
        assert len(data) == 3
        assert fmt.unpack_block_header(data) == (size, ext)


def test_block_header_ext_bit():
    raw = fmt.pack_block_header(0x123456, True)
    assert raw[2] & 0x80  # bit 23 set


def test_n_blocks():
    assert fmt.n_blocks_for(0) == 0
    assert fmt.n_blocks_for(1) == 1
    assert fmt.n_blocks_for(fmt.BLOCK_SZ) == 1
    assert fmt.n_blocks_for(fmt.BLOCK_SZ + 1) == 2


def test_split_blocks():
    data = bytes(fmt.BLOCK_SZ + 100)
    blocks = fmt.split_blocks(data)
    assert [len(b) for b in blocks] == [fmt.BLOCK_SZ, 100]
    assert fmt.split_blocks(b"") == []


def test_scan_block_table_truncation():
    hdr = fmt.ContainerHeader(1, 100).pack()
    stream = hdr + fmt.pack_block_header(50, False) + bytes(10)
    with pytest.raises(fmt.FormatError):
        fmt.scan_block_table(stream)
