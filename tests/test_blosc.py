"""First-party blosc frame + LZ4 block codec tests (data/blosc.py,
native/lz4.cpp). Gates the format against a hand-assembled known-answer LZ4
vector (spec: lz4 Block_format.md), round-trips every inner codec, and opens
a blosc-compressed zarr store — the layout real OCF satellite archives use
(reference notebook 13 cell 10)."""

import numpy as np
import pytest

from predict_pv_yield_tpu import native
from predict_pv_yield_tpu.data import blosc
from predict_pv_yield_tpu.data.zarr_reader import open_zarr, write_zarr


@pytest.fixture(scope="module", autouse=True)
def _native(request):
    try:
        native.load_library()
    except native.NativeUnavailable as exc:  # pragma: no cover
        pytest.skip(f"native library unavailable: {exc}")


def test_lz4_known_answer_vector():
    # token 0x54: 5 literals, match len 4+4=8; offset 5 → copies the 5-byte
    # literal run starting over (overlapping match extends the repetition);
    # final sequence: 4 literals ("end!").
    block = bytes([0x54]) + b"abcde" + bytes([0x05, 0x00]) + bytes([0x40]) + b"end!"
    out = native.lz4_decompress(block, 5 + 8 + 4)
    assert out == b"abcdeabcdeabcend!"


def test_lz4_roundtrip_structured():
    rng = np.random.default_rng(0)
    # repetitive + random sections exercise matches, long literal runs, and
    # the overlap copy
    data = (
        b"0123456789" * 400
        + rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()
        + b"\x00" * 5000
        + b"tail"
    )
    compressed = native.lz4_compress(data)
    assert len(compressed) < len(data)
    assert native.lz4_decompress(compressed, len(data)) == data


def test_lz4_rejects_malformed():
    with pytest.raises(ValueError):
        native.lz4_decompress(b"\xff\xff\xff", 100)


def test_byte_shuffle_roundtrip():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 2**16, 1000, dtype=np.uint16).tobytes()
    shuffled = native.byte_shuffle(data, 2)
    assert shuffled != data
    # shuffled layout: all low bytes then all high bytes
    arr = np.frombuffer(data, np.uint8).reshape(-1, 2)
    assert shuffled == arr[:, 0].tobytes() + arr[:, 1].tobytes()
    assert native.byte_unshuffle(shuffled, 2) == data


@pytest.mark.parametrize("cname", ["lz4", "zlib", "zstd"])
@pytest.mark.parametrize("shuffle", [True, False])
def test_blosc_roundtrip(cname, shuffle):
    rng = np.random.default_rng(2)
    # int16 satellite-like data: smooth ramps + noise, > 1 block at 256 KiB
    base = np.linspace(0, 1023, 400_000).astype(np.int16)
    noisy = base + rng.integers(-3, 4, base.shape).astype(np.int16)
    raw = noisy.tobytes()
    frame = blosc.compress(raw, typesize=2, cname=cname, shuffle=shuffle)
    assert len(frame) < len(raw)
    assert blosc.decompress(frame) == raw


def test_blosc_memcpy_frame():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes()  # incompressible
    frame = blosc.compress(raw, typesize=1, cname="lz4")
    assert frame[2] & 0x2  # memcpy flag
    assert blosc.decompress(frame) == raw


def test_blosc_leftover_block_and_split_layout():
    # nbytes chosen so the last block is partial (never split); full blocks
    # of int16 ARE split into 2 streams per the c-blosc rule
    rng = np.random.default_rng(4)
    data = (np.arange(300_000, dtype=np.int16) % 997).astype(np.int16)
    data[::7] += rng.integers(0, 3, data[::7].shape).astype(np.int16)
    raw = data.tobytes()
    frame = blosc.compress(raw, typesize=2, cname="lz4", blocksize=65536)
    assert blosc.decompress(frame) == raw


def test_zarr_blosc_store(tmp_path):
    """A blosc-lz4 zarr store (the real-archive layout) opens and slices."""
    rng = np.random.default_rng(5)
    data = (rng.normal(300, 80, (7, 96, 96)) * 4).astype(np.int16)
    path = str(tmp_path / "hrv.zarr")
    write_zarr(path, data, chunks=(2, 64, 64), compressor="blosc")
    arr = open_zarr(path)
    np.testing.assert_array_equal(arr[:], data)
    np.testing.assert_array_equal(arr[3:6, 10:90, 5:], data[3:6, 10:90, 5:])
    np.testing.assert_array_equal(arr[4], data[4])


def test_lz4_fuzz_roundtrip_and_corruption():
    """Randomised hardening: (a) compress→decompress is identity across
    sizes/entropy mixes; (b) truncated and bit-flipped streams, and pure
    garbage, always fail CLEANLY (ValueError from the length check or the
    decoder's -1) — never a crash or out-of-bounds write."""
    rng = np.random.default_rng(42)
    for size in (0, 1, 7, 64, 1000, 65536):
        for pattern in ("random", "runs", "mixed"):
            if pattern == "random":
                data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
            elif pattern == "runs":
                data = (b"\x00" * (size // 2)) + (b"ab" * (size - size // 2))[: size - size // 2]
            else:
                half = rng.integers(0, 4, size // 2, dtype=np.uint8).tobytes()
                data = half + rng.integers(0, 256, size - len(half), dtype=np.uint8).tobytes()
            compressed = native.lz4_compress(data)
            assert native.lz4_decompress(compressed, len(data)) == data

    # corruption: truncate a valid stream at every prefix of a small block,
    # and flip bytes in a larger one. A no-exception outcome is only
    # acceptable when the decoder produced EXACTLY the right bytes (the
    # length check would otherwise have raised): strict truncations must
    # never silently "succeed" with garbage — that is the out-of-bounds
    # class this fuzz exists to gate.
    data = b"0123456789" * 20 + bytes(rng.integers(0, 256, 50, dtype=np.uint8))
    compressed = native.lz4_compress(data)
    for cut in range(len(compressed)):
        try:
            out = native.lz4_decompress(compressed[:cut], len(data))
        except ValueError:
            continue  # clean rejection is the contract
        assert cut == len(compressed) and out == data, cut
    for _ in range(200):
        corrupted = bytearray(compressed)
        corrupted[rng.integers(0, len(corrupted))] ^= 1 << rng.integers(0, 8)
        try:
            out = native.lz4_decompress(bytes(corrupted), len(data))
        except ValueError:
            continue
        # a flip may land in literal bytes (valid stream, different data):
        # the decode must still be length-exact, never over/under-run
        assert len(out) == len(data)
    # pure garbage at several lengths: length-exact or clean rejection
    for n in (1, 2, 16, 300):
        try:
            out = native.lz4_decompress(
                bytes(rng.integers(0, 256, n, dtype=np.uint8)), 4096
            )
        except ValueError:
            continue
        assert len(out) == 4096


def test_blosc_frame_fuzz_rejects_garbage():
    """Random and truncated frames must raise (ValueError/struct.error),
    never crash, and valid frames survive a full corruption sweep of clean
    failures or correct output."""
    rng = np.random.default_rng(7)
    payload = np.arange(4096, dtype=np.int16).tobytes()
    frame = blosc.compress(payload, typesize=2, cname="lz4", shuffle=1)
    assert blosc.decompress(frame) == payload

    for cut in range(0, len(frame), 7):
        try:
            out = blosc.decompress(frame[:cut])
        except Exception as exc:  # noqa: BLE001 — any *clean* python error
            assert not isinstance(exc, (SystemError, MemoryError)), exc
        else:
            # only the complete frame may decode without error
            assert cut == len(frame) and out == payload, cut
    # flips past the 16-byte header leave the declared nbytes intact, so a
    # no-exception decode must still be length-exact (blosc has no payload
    # checksum — wrong BYTES are format-conformant, wrong LENGTH is not)
    for _ in range(100):
        corrupted = bytearray(frame)
        corrupted[16 + rng.integers(0, len(corrupted) - 16)] ^= 0xFF
        try:
            out = blosc.decompress(bytes(corrupted))
            assert len(out) == len(payload)
        except Exception as exc:  # noqa: BLE001
            assert not isinstance(exc, (SystemError, MemoryError)), exc


def test_python_lz4_fallback_matches_native():
    """PREDICT_PV_YIELD_TPU_NO_NATIVE promises every capability still works.
    The pure-Python decoder is exercised on MATCH-bearing streams (both a
    hand-built vector and, when native is present, a native-compressed
    block), and the numpy shuffle fallback is forced via monkeypatching and
    checked against a hand-computed vector — not against itself."""
    import numpy as np

    from predict_pv_yield_tpu import native

    # hand-built LZ4 vectors: the match/offset decode path must work even
    # where the native library never existed
    # "abcdabcd": 4 literals + match(offset 4, len 4) + empty end token
    assert native._lz4_decompress_py(b"\x40abcd\x04\x00\x00", 8) == b"abcdabcd"
    # "a"*10: 1 literal + OVERLAPPING match(offset 1, len 9)
    assert native._lz4_decompress_py(b"\x15a\x01\x00\x00", 10) == b"a" * 10
    payload = (b"solar pv yield " * 300) + bytes(range(256)) * 4
    literals = native._lz4_compress_py(payload)
    assert native._lz4_decompress_py(literals, len(payload)) == payload

    try:
        compressed = native.lz4_compress(payload)
        native_ok = native.lz4_decompress(compressed, len(payload)) == payload
    except native.NativeUnavailable:
        native_ok = False
    if native_ok:
        # the Python decoder accepts real native-compressed blocks exactly
        assert native._lz4_decompress_py(compressed, len(payload)) == payload
        assert native.lz4_decompress(literals, len(payload)) == payload


def test_numpy_shuffle_fallback_forced(monkeypatch):
    """Force the no-native branch and hold the numpy shuffle fallback to a
    hand-computed byte permutation (c-blosc shuffle semantics incl. the
    unshuffled tail)."""
    from predict_pv_yield_tpu import native

    def unavailable():
        raise native.NativeUnavailable("forced by test")

    monkeypatch.setattr(native, "load_library", unavailable)
    data = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])  # 2 elements of 4 + tail 2
    expected = bytes([1, 5, 2, 6, 3, 7, 4, 8, 9, 10])
    assert native.byte_shuffle(data, 4) == expected
    assert native.byte_unshuffle(expected, 4) == data
    # lz4 wrappers also fall back
    assert native.lz4_decompress(b"\x40abcd\x04\x00\x00", 8) == b"abcdabcd"
    frame = native.lz4_compress(b"xyz")
    assert native.lz4_decompress(frame, 3) == b"xyz"
