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


try:
    import av  # noqa: F401

    HAS_AV = True
except ImportError:
    HAS_AV = False


def test_fake_video_keyframes_contract(spark):
    """Deterministic tier: evenly spaced keyframes at 25 fps, dense
    kf_idx, consistent n_keyframes, md5 of each 16-byte window."""
    import hashlib

    from streamlit_flink_demo_spark.operators.multimodal import (
        video_keyframes_batch,
    )

    data = bytes(range(256)) * 5  # 1280 bytes → 4 keyframes
    rows = sorted(
        video_keyframes_batch(_blob_df(spark, data)).collect(),
        key=lambda r: r.kf_idx,
    )
    assert [r.kf_idx for r in rows] == [0, 1, 2, 3]
    assert all(r.n_keyframes == 4 for r in rows)
    stride = len(data) // 4
    for r in rows:
        pos = r.kf_idx * stride
        assert r.pts_ms == pos * 40
        # fake tier hashes the uppercase-hex rendering (oracle
        # byte-exactness without DuckDB md5(BLOB))
        assert r.frame_md5 == hashlib.md5(
            data[pos : pos + 16].hex().upper().encode()
        ).hexdigest()


def test_fake_video_keyframes_short_blob_single_frame(spark):
    from streamlit_flink_demo_spark.operators.multimodal import (
        video_keyframes_batch,
    )

    rows = video_keyframes_batch(_blob_df(spark, b"tiny")).collect()
    assert len(rows) == 1
    assert (rows[0].kf_idx, rows[0].n_keyframes, rows[0].pts_ms) == (0, 1, 0)


@pytest.mark.skipif(HAS_AV, reason="pyav installed: remedy path N/A")
def test_real_video_keyframes_without_pyav_raises_with_remedy(spark):
    from streamlit_flink_demo_spark.operators.multimodal import (
        video_keyframes_batch,
    )

    df = video_keyframes_batch(_blob_df(spark, b"\x00" * 64), fake=False)
    with pytest.raises(Exception, match="pyav"):
        df.collect()


@pytest.mark.skipif(not HAS_AV, reason="pyav not installed")
def test_real_video_keyframes_with_pyav(spark):
    """With pyav: encode a tiny synthetic video in-process and assert
    real keyframes come back through the identical Arrow plumbing."""
    import io

    import av
    import numpy as np

    from streamlit_flink_demo_spark.operators.multimodal import (
        video_keyframes_batch,
    )

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=25)
        stream.width, stream.height, stream.pix_fmt = 64, 64, "yuv420p"
        for i in range(12):
            arr = np.full((64, 64, 3), i * 20, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    rows = video_keyframes_batch(
        _blob_df(spark, buf.getvalue()), fake=False
    ).collect()
    assert rows
    assert all(r.frame_md5 and len(r.frame_md5) == 32 for r in rows)
    assert sorted(r.kf_idx for r in rows) == list(range(len(rows)))


def test_binary_window_oracles_are_byte_exact_on_multibyte_text(spark):
    """Regression: the keyframe/frame-sample oracles must window the
    UTF-8 BYTE stream, not characters — a corpus with multi-byte
    characters (é, 中, emoji) must still hash-match DuckDB."""
    import duckdb

    from streamlit_flink_demo_spark.operators.multimodal import (
        _DECODE_FAKE_ORACLE,
        _DECODE_RESIZE_ORACLE,
        _FRAME_SAMPLE_ORACLE,
        _KEYFRAME_ORACLE,
        sample_frames_batch,
        video_keyframes_batch,
    )
    from pyspark.sql import functions as F

    texts = [
        (0, "héllo wörld " * 40),          # 2-byte chars sprinkled
        (1, "中文文本" * 100),               # 3-byte chars only
        (2, "plain ascii text " * 30),      # control
        (3, "mixed 🚀 emoji ascii " * 25),  # 4-byte chars
        (4, ""),                            # empty doc (ord('')=-1 trap)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(
        texts, columns=["doc_id", "text"]
    ))

    blob = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    for op_df, oracle, cols in (
        (
            video_keyframes_batch(blob),
            _KEYFRAME_ORACLE,
            ["doc_id", "kf_idx", "n_keyframes", "pts_ms", "frame_md5"],
        ),
        (
            sample_frames_batch(blob).select(
                "doc_id",
                "frame_idx",
                "n_frames",
                F.hex("frame").alias("frame_hex"),
                F.md5(F.hex("frame")).alias("frame_md5"),
            ),
            _FRAME_SAMPLE_ORACLE,
            ["doc_id", "frame_idx", "n_frames", "frame_hex", "frame_md5"],
        ),
        (
            decode_binary_batch(blob),
            _DECODE_FAKE_ORACLE,
            ["doc_id", "n_bytes", "width", "height", "mean_luma"],
        ),
        (
            decode_binary_batch(
                resize_binary_batch(blob).select("doc_id", "content")
            ),
            _DECODE_RESIZE_ORACLE,
            ["doc_id", "n_bytes", "width", "height", "mean_luma"],
        ),
    ):
        got = sorted(tuple(r[c] for c in cols) for r in op_df.collect())
        want = sorted(tuple(r) for r in con.execute(oracle).fetchall())
        assert got == want


def test_fake_audio_features_contract(spark):
    """Fake PCM tier: deterministic integer features reproducible from
    pure Python over the same stride resample."""
    from streamlit_flink_demo_spark.operators.multimodal import (
        _AUDIO_SAMPLES,
        audio_features_batch,
    )

    data = bytes(range(200)) * 3
    (row,) = audio_features_batch(_blob_df(spark, data)).collect()
    n = len(data)
    sv = []
    for i in range(_AUDIO_SAMPLES):
        b = data[(i * n) // _AUDIO_SAMPLES]
        sv.append(((b + 128) % 256) - 128)
    assert row["n_bytes"] == n
    assert row["duration_ms"] == (n * 1000) // 16000
    assert row["energy_sq"] == sum(v * v for v in sv)
    assert row["zero_crossings"] == sum(
        1 for a, b in zip(sv, sv[1:]) if (a < 0) != (b < 0)
    )
    assert row["peak"] == max(abs(v) for v in sv)


def test_fake_audio_features_empty_blob(spark):
    from streamlit_flink_demo_spark.operators.multimodal import (
        audio_features_batch,
    )

    (row,) = audio_features_batch(_blob_df(spark, b"")).collect()
    assert (
        row["n_bytes"],
        row["duration_ms"],
        row["energy_sq"],
        row["zero_crossings"],
        row["peak"],
    ) == (0, 0, 0, 0, 0)


def test_real_audio_without_soundfile_raises_with_remedy(spark):
    from streamlit_flink_demo_spark.operators.multimodal import (
        audio_features_batch,
    )

    df = audio_features_batch(_blob_df(spark, b"\x00" * 64), fake=False)
    try:
        import soundfile  # noqa: F401

        pytest.skip("soundfile available — covered by the with-dep test")
    except ImportError:
        pass
    with pytest.raises(Exception, match="soundfile"):
        df.collect()


def test_fake_audio_features_boundary_blobs(spark):
    """Byte-math edge cases in ONE Spark job: sign boundaries (0x7f vs
    0x80 vs 0xff), sub-/at-/over-resample-width lengths, constant
    extremes — each checked against an independent pure-Python
    reference of the documented contract."""
    from streamlit_flink_demo_spark.operators.multimodal import (
        _AUDIO_SAMPLES,
        audio_features_batch,
    )

    blobs = {
        1: b"\x7f",                      # +127, single byte
        2: b"\x80",                      # -128, single byte (peak 128)
        3: b"\x80" * 64,                 # constant extreme negative
        4: b"\x00\xff" * 40,             # alternating 0 / -1
        5: bytes(range(256)),            # full byte range
        6: b"a" * (_AUDIO_SAMPLES - 1),  # below resample width
        7: b"b" * _AUDIO_SAMPLES,        # exactly resample width
        8: b"c" * (_AUDIO_SAMPLES + 1),  # above resample width
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()],
        "doc_id long, content binary",
    )
    got = {r["doc_id"]: r for r in audio_features_batch(df).collect()}
    for k, data in blobs.items():
        n = len(data)
        sv = [
            ((data[(i * n) // _AUDIO_SAMPLES] + 128) % 256) - 128
            for i in range(_AUDIO_SAMPLES)
        ]
        r = got[k]
        assert r["n_bytes"] == n
        assert r["duration_ms"] == (n * 1000) // 16000
        assert r["energy_sq"] == sum(v * v for v in sv), k
        assert r["zero_crossings"] == sum(
            1 for a, b in zip(sv, sv[1:]) if (a < 0) != (b < 0)
        ), k
        assert r["peak"] == max(abs(v) for v in sv), k


def test_real_audio_with_soundfile(spark):
    """With-dep tier: a real mono WAV (and a stereo one, exercising the
    first-channel selection) decodes to sane integer features."""
    try:
        import soundfile
    except ImportError:
        pytest.skip("soundfile not installed — remedy path tested instead")
    import io

    import numpy as np

    from streamlit_flink_demo_spark.operators.multimodal import (
        audio_features_batch,
    )

    rate = 16_000
    t = np.arange(rate)  # 1 second
    mono = (np.sin(2 * np.pi * 440 * t / rate) * 20_000).astype(np.int16)
    buf = io.BytesIO()
    soundfile.write(buf, mono, rate, format="WAV", subtype="PCM_16")
    (row,) = audio_features_batch(
        _blob_df(spark, buf.getvalue()), fake=False
    ).collect()
    assert row["duration_ms"] == 1000
    assert 19_000 <= row["peak"] <= 20_000
    assert row["zero_crossings"] > 800  # ~880 crossings for 440 Hz

    stereo = np.stack([mono, np.zeros_like(mono)], axis=1)
    buf2 = io.BytesIO()
    soundfile.write(buf2, stereo, rate, format="WAV", subtype="PCM_16")
    (row2,) = audio_features_batch(
        _blob_df(spark, buf2.getvalue()), fake=False
    ).collect()
    # first channel only: duration must NOT double, crossings match mono
    assert row2["duration_ms"] == 1000
    assert abs(row2["zero_crossings"] - row["zero_crossings"]) <= 2


def test_phash_pairs_match_pure_python(spark, sf_dir):
    """multimodal_phash_pairs vs a pure-Python reimplementation of the
    signature + banding + cap + Hamming pipeline (no Spark, no SQL):
    identical pair set and distances."""
    from collections import defaultdict

    import pandas as pd

    from streamlit_flink_demo_spark.operators.multimodal import (
        _PHASH_BANDS,
        _PHASH_BANDW,
        _PHASH_BITS,
        _PHASH_BUCKET_CAP,
        _PHASH_T,
    )
    from streamlit_flink_demo_spark.plans import load_all

    reg = load_all(exposed_only=False)
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in reg["multimodal_phash_pairs"]
        .fn(spark, sf_dir)
        .toPandas()
        .itertuples()
    }

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs = docs[docs.text.notna()]
    sigs = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        bs = list(text.encode("utf-8"))[:_PHASH_BITS]
        bs += [0] * (_PHASH_BITS - len(bs))
        tot = sum(bs)
        sig = sum(
            1 << i for i, b in enumerate(bs) if _PHASH_BITS * b > tot
        )
        sigs[doc_id] = sig
    buckets = defaultdict(list)
    for doc_id in sorted(sigs):
        for band in range(_PHASH_BANDS):
            bv = (sigs[doc_id] >> (band * _PHASH_BANDW)) & (
                (1 << _PHASH_BANDW) - 1
            )
            buckets[(band, bv)].append(doc_id)
    want = {}
    for members in buckets.values():
        members = members[:_PHASH_BUCKET_CAP]
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                lo, hi = min(a, b), max(a, b)
                d = bin(sigs[lo] ^ sigs[hi]).count("1")
                if d <= _PHASH_T:
                    want[(lo, hi)] = d
    assert got == want
    assert len(got) > 0
