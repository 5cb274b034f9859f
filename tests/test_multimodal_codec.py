"""Contract tests for the multimodal codec tiers.

The registered queries run the deterministic fake codec (oracle-
checked); ``fake=False`` is the real-bytes tier, gated on Pillow being
importable. These tests pin the contract BOTH ways: without the
optional dependency the pipeline fails loudly with the install remedy
(never silently wrong data); with it, real PNG bytes decode through
the identical Arrow plumbing. The PNG fixture is generated with
stdlib-only zlib/struct so the with-dep test needs nothing beyond
Pillow itself.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from streamlit_flink_demo_spark.operators.multimodal import (
    decode_binary_batch,
    resize_binary_batch,
    sample_frames_batch,
)

try:
    import PIL  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def make_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal valid RGB PNG via stdlib only (signature, IHDR, IDAT
    with per-scanline filter byte 0, IEND)."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(rgb) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _blob_df(spark, data: bytes):
    return spark.createDataFrame(
        [(1, bytearray(data))], "doc_id long, content binary"
    )


@pytest.mark.skipif(HAS_PIL, reason="Pillow installed: remedy path N/A")
def test_real_decode_without_pillow_raises_with_remedy(spark):
    df = decode_binary_batch(_blob_df(spark, make_png(4, 2, (10, 20, 30))), fake=False)
    with pytest.raises(Exception, match="Pillow"):
        df.collect()


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_real_decode_with_pillow(spark):
    png = make_png(6, 3, (255, 0, 0))
    rows = decode_binary_batch(_blob_df(spark, png), fake=False).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.width, r.height, r.n_bytes) == (6, 3, len(png))
    # pure red: ITU-R 601 luma of (255,0,0) is 76/255
    assert abs(r.mean_luma - 76 / 255.0) < 0.02


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_real_resize_then_decode_roundtrip(spark):
    png = make_png(16, 16, (0, 128, 255))
    resized = resize_binary_batch(
        _blob_df(spark, png), out_width=8, out_height=4, fake=False
    ).select("doc_id", "content")
    rows = decode_binary_batch(resized, fake=False).collect()
    assert len(rows) == 1
    assert (rows[0].width, rows[0].height) == (8, 4)


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_real_frame_sample_single_frame_png(spark):
    png = make_png(4, 4, (9, 9, 9))
    rows = sample_frames_batch(_blob_df(spark, png), fake=False).collect()
    assert len(rows) == 1
    assert (rows[0].frame_idx, rows[0].n_frames) == (0, 1)
    assert rows[0].frame_md5


def test_fake_tier_unaffected_by_flag_default(spark):
    """The registered-query path (fake=True) stays byte-deterministic
    regardless of whether Pillow is installed."""
    data = b"0123456789" * 20
    rows = decode_binary_batch(_blob_df(spark, data), fake=True).collect()
    n = len(data)
    assert rows[0].width == 64 + (n * 2654435761 % 1217) % 1280
    assert rows[0].height == 64 + (n * 40503 % 1013) % 720
    assert rows[0].mean_luma == (sum(data[:64]) % 256) / 255.0
