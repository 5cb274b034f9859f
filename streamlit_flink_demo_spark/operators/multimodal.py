"""Multimodal column plumbing.

Images/audio/video are carried as opaque ``binary`` columns plus typed
metadata — the layout a 100 TB multimodal corpus actually uses
(parquet binary + metadata columns; bytes stay columnar, never in
Python unless a decode step needs them).

Codec tiers: ``fake=True`` (default in the registered queries) is a
deterministic byte-arithmetic codec — the test/oracle path, SQL-
replayable. ``fake=False`` decodes real bytes via Pillow when it is
importable on the executors (optional dependency — this container
ships without it) and raises NotImplementedError with the install
remedy otherwise; real video keyframe extraction (pyav/ffmpeg) stays
stubbed. The Spark-side plumbing (binary schema, Arrow batching,
mapInPandas batch shapes, partition sizing) is identical across tiers
and is what the contract tests pin (tests/test_multimodal_codec.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.hashing import u60_sql
from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# Binary metadata — pure built-ins, oracle-checkable
# --------------------------------------------------------------------------

_META_ORACLE = f"""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       ({u60_sql('text')} % 1280)::BIGINT AS fake_width,
       ({u60_sql('text')} % 720)::BIGINT AS fake_height
FROM documents
"""


@register(
    "multimodal_binary_meta",
    oracle=_META_ORACLE,
    tags=("multimodal",),
    expose=False,  # r9: driver-surfaced via multimodal_suite
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction: documents.text re-encoded as
    an opaque blob (standing in for image bytes), then byte length,
    content digest, and deterministic fake dimensions derived from the
    digest. All JVM-side; the blob never reaches Python."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    h = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("bigint")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.md5(F.col("text")).alias("content_md5"),
        (h % 1280).alias("fake_width"),
        (h % 720).alias("fake_height"),
    )


# --------------------------------------------------------------------------
# Decode pipeline — mapInPandas plumbing with stubbed decoder
# --------------------------------------------------------------------------

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, mean_luma double"
)


# -- deterministic-codec oracles -------------------------------------------
# The fake codec is pure integer arithmetic over the blob bytes, so the
# whole decode/resize/frame pipeline is SQL-replayable BYTE-exactly:
# DuckDB has no blob indexing, but byte p of the stream is the hex pair
# ('0x' || substring(hex(encode(text)), p*2+1, 2))::INT — valid for any
# UTF-8 content including multi-byte characters (a char-based
# ord(substring(text, ...)) formulation diverges there, and returns -1
# for the out-of-range reads an empty document produces). These replays
# make the multimodal queries hash-checked CORRECTNESS rows instead of
# rows-only.

def _decode_oracle_sql(n_expr: str, byte_at: "callable") -> str:
    """SELECT-list fragment for the fake decoder over a byte stream of
    length ``n_expr`` whose 0-based byte ``p`` is ``byte_at(p)``."""
    luma_terms = f"[{byte_at('i')} for i in range(least({n_expr}, 64))]"
    return f"""
       ({n_expr})::INT AS n_bytes,
       (64 + ((({n_expr})::BIGINT * 2654435761) % 1217) % 1280)::INT AS width,
       (64 + ((({n_expr})::BIGINT * 40503) % 1013) % 720)::INT AS height,
       (CASE WHEN ({n_expr}) = 0 THEN 0.0
             ELSE ((list_aggregate({luma_terms}, 'sum')) % 256) / 255.0
        END) AS mean_luma"""


_DECODE_FAKE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id,{_decode_oracle_sql(
    "n",
    lambda p: f"('0x' || substring(hx, ({p})*2+1, 2))::INT",
)}
FROM base
"""

_RESIZE_TARGET = 224 * 224 // 64  # resize_binary_batch's output byte count

# decode∘resize: the resized stream has exactly _RESIZE_TARGET bytes and
# its byte i is input byte (i*n)//target (stride re-sample) — or 0 for
# an empty input (resize emits bytes(target) zeros), which the CASE
# mirrors: the decoder's n is the constant target, so the zero-input
# branch must live in byte_at, not in the n=0 luma guard.
_DECODE_RESIZE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id,{_decode_oracle_sql(
    str(_RESIZE_TARGET),
    lambda p: (
        "(CASE WHEN n = 0 THEN 0 ELSE ('0x' || substring(hx, "
        f"((({p})*n)//{_RESIZE_TARGET})*2+1, 2))::INT END)"
    ),
)}
FROM base
"""

# BYTE-exact (see _KEYFRAME_ORACLE note): windows are slices of the
# UTF-8 byte stream, expressed as substrings of hex(encode(text)) — 2
# hex chars per byte — and frame_md5 hashes that hex rendering (DuckDB
# has no md5(BLOB)). Character-based substring(text, ...) silently
# diverges from the operator's byte windows on multi-byte documents.
_FRAME_SAMPLE_ORACLE = """
WITH base AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n,
         least(4, greatest(octet_length(encode(text))//64, 1)) AS n_frames
  FROM documents
),
idx AS (SELECT 0 AS frame_idx UNION ALL SELECT 1
        UNION ALL SELECT 2 UNION ALL SELECT 3)
SELECT doc_id,
       idx.frame_idx::INT AS frame_idx,
       n_frames::INT AS n_frames,
       substring(hx, idx.frame_idx*(n//n_frames)*2 + 1, (n//n_frames)*2)
         AS frame_hex,
       md5(substring(hx, idx.frame_idx*(n//n_frames)*2 + 1, (n//n_frames)*2))
         AS frame_md5
FROM base JOIN idx ON idx.frame_idx < base.n_frames
"""


def decode_binary_batch(
    df: DataFrame, binary_col: str = "content", id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """mapInPandas decode: Arrow-batched bytes → metadata rows.

    This is the pattern for any multimodal feature extraction at scale:
    the binary column arrives in Arrow record batches (no per-row
    pickling); output schema is fixed and narrow; repartition upstream
    controls batch memory (bytes_per_partition ≈ maxPartitionBytes).

    NB: everything the closure needs is defined inside it, so
    cloudpickle ships it BY VALUE — executors do not need this package
    importable (the driver may run us from any cwd)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def decode_image(data: bytes) -> tuple[int, int, float]:
            # fake=True: deterministic byte-arithmetic codec (the test
            # and oracle path). fake=False: real decode via Pillow when
            # importable on the executor; otherwise raise with remedy.
            if not fake:
                try:
                    import io

                    from PIL import Image
                except ImportError as ex:
                    raise NotImplementedError(
                        "real image decode requires Pillow (pip install "
                        "Pillow) — not available here; use fake=True for "
                        "the deterministic test decoder"
                    ) from ex
                img = Image.open(io.BytesIO(data))
                width, height = img.size
                gray = img.convert("L")
                hist = gray.histogram()
                n_px = sum(hist) or 1
                mean_luma = (
                    sum(v * c for v, c in enumerate(hist)) / n_px / 255.0
                )
                return width, height, mean_luma
            n = len(data)
            width = 64 + (n * 2654435761 % 1217) % 1280
            height = 64 + (n * 40503 % 1013) % 720
            mean_luma = (sum(data[:64]) % 256) / 255.0 if n else 0.0
            return width, height, mean_luma

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(data) if data is not None else b""
                w, h, luma = decode_image(data)
                rows.append((doc_id, len(data), w, h, luma))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "width", "height", "mean_luma"]
            )

    return df.mapInPandas(op, schema=DECODE_SCHEMA)


@register("multimodal_decode_fake", oracle=_DECODE_FAKE_ORACLE, tags=("multimodal", "pandas-udf"), expose=False)
def multimodal_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end mapInPandas decode over fake image bytes (text bytes
    as the blob). The deterministic fake codec is pure byte arithmetic,
    so the oracle replays it in SQL (hash-checked); the Arrow plumbing,
    schema, and batch shape are the real deliverable."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return decode_binary_batch(d, fake=True)


# --------------------------------------------------------------------------
# Resize — binary-in/binary-out mapInPandas (1 row → 1 row)
# --------------------------------------------------------------------------

RESIZE_SCHEMA = (
    "doc_id bigint, content binary, out_width int, out_height int, n_bytes_out int"
)


def resize_binary_batch(
    df: DataFrame,
    out_width: int = 224,
    out_height: int = 224,
    binary_col: str = "content",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Resize plumbing: binary in, binary out, fixed target dims — the
    preprocessing step in front of any vision encoder. The fake
    'resize' deterministically re-samples the byte stream to
    out_width*out_height/64 bytes (stride sampling), so output size is
    content-independent exactly like a real resize; swap the inner
    function for PIL/cv2 where available. Binary stays in Arrow both
    directions — no base64, no row-at-a-time pickling."""

    def op(batches):
        import pandas as _pd

        target = max(out_width * out_height // 64, 1)

        def resize(data: bytes) -> bytes:
            if not fake:
                try:
                    import io

                    from PIL import Image
                except ImportError as ex:
                    raise NotImplementedError(
                        "real image resize requires Pillow (pip install "
                        "Pillow) — not available here; use fake=True for "
                        "the deterministic stride sampler"
                    ) from ex
                img = Image.open(io.BytesIO(data))
                out = io.BytesIO()
                img.resize((out_width, out_height)).save(out, format="PNG")
                return out.getvalue()
            if not data:
                return bytes(target)
            # deterministic stride re-sample to exactly `target` bytes
            n = len(data)
            return bytes(data[(i * n) // target] for i in range(target))

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(data) if data is not None else b""
                out = resize(data)
                rows.append((doc_id, out, out_width, out_height, len(out)))
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "content", "out_width", "out_height", "n_bytes_out",
                ],
            )

    return df.mapInPandas(op, schema=RESIZE_SCHEMA)


@register("multimodal_resize_fake", oracle=None, tags=("multimodal", "pandas-udf"), expose=False)
def multimodal_resize_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-image resize to 224×224 over the documents blob column.
    Rows-only check; the byte-level determinism and 1-row-in/1-row-out
    contract are pytest-verified."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return resize_binary_batch(d, fake=True)


# --------------------------------------------------------------------------
# Frame sampling — mapInPandas fan-out (1 row → N rows)
# --------------------------------------------------------------------------

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, n_frames int, frame binary, frame_md5 string"
)


def sample_frames_batch(
    df: DataFrame,
    max_frames: int = 4,
    binary_col: str = "content",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Frame sampling: one 'video' blob → up to ``max_frames`` evenly
    spaced 'frames' (fan-out mapInPandas — output batches need not
    align 1:1 with input rows, which is exactly what makes this shape
    impossible as a scalar UDF). The fake extractor slices the byte
    stream into equal windows; a real one would seek keyframes with
    pyav/ffmpeg. At 100 TB: repartition upstream by blob size so a
    batch's decoded frames fit executor memory."""

    def op(batches):
        import hashlib as _hl

        import pandas as _pd

        def frames(data: bytes):
            if not fake:
                # Real video keyframe extraction needs pyav/ffmpeg;
                # Pillow covers the multi-frame image formats (GIF,
                # multi-page TIFF) as the importable-dependency tier.
                try:
                    import io

                    from PIL import Image, ImageSequence
                except ImportError as ex:
                    raise NotImplementedError(
                        "real frame extraction requires Pillow for "
                        "multi-frame images (pyav/ffmpeg for video) — "
                        "not available here; use fake=True for the "
                        "byte-window sampler"
                    ) from ex
                img = Image.open(io.BytesIO(data))
                all_frames = list(ImageSequence.Iterator(img))
                n = len(all_frames)
                take = min(max_frames, n)
                picks = [(i * n) // take for i in range(take)]
                out = []
                for p in picks:
                    buf = io.BytesIO()
                    all_frames[p].convert("RGB").save(buf, format="PNG")
                    out.append(buf.getvalue())
                return out
            if not data:
                return [b""]
            n_frames = min(max_frames, max(len(data) // 64, 1))
            w = len(data) // n_frames
            return [data[i * w : (i + 1) * w] for i in range(n_frames)]

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(data) if data is not None else b""
                fs = frames(data)
                for i, fr in enumerate(fs):
                    rows.append(
                        (doc_id, i, len(fs), fr, _hl.md5(fr).hexdigest())
                    )
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "n_frames", "frame", "frame_md5"],
            )

    return df.mapInPandas(op, schema=FRAME_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle=_FRAME_SAMPLE_ORACLE,
    tags=("multimodal", "pandas-udf"),
    expose=False,  # r9: driver-surfaced via multimodal_suite
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evenly-spaced frame sampling over the documents blob as a fake
    video. The byte-window sampler is deterministic, so the oracle
    replays the slicing + md5 in SQL (hash-checked, frame bytes
    included); fan-out arity is additionally pytest-verified.

    The driver surface hex-encodes the frame bytes (``frame_hex``):
    raw binary crashes pandas-based result canonicalizers
    (``bytearray`` is unhashable — the CORRECTNESS_r04 harness
    failure), and a comparison surface should be text anyway; the
    surface ``frame_md5`` hashes that hex rendering so the oracle is
    byte-exact on multi-byte documents (DuckDB has no md5(BLOB)). The
    internal API (``sample_frames_batch``) still returns real binary
    with raw-byte md5s."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    hx = F.hex("frame")
    return sample_frames_batch(d, fake=True).select(
        "doc_id",
        "frame_idx",
        "n_frames",
        hx.alias("frame_hex"),
        F.md5(hx).alias("frame_md5"),
    )


# --------------------------------------------------------------------------
# Video keyframe extraction — pyav real tier / deterministic fake tier
# --------------------------------------------------------------------------

KEYFRAME_SCHEMA = (
    "doc_id bigint, kf_idx int, n_keyframes int, pts_ms bigint, "
    "frame_md5 string"
)

# BYTE-exact oracle: windowing is over the UTF-8 byte stream, and
# DuckDB has neither blob slicing nor md5(BLOB) — so both engines hash
# the uppercase-hex RENDERING of each byte window, which a VARCHAR
# substring over hex(encode(text)) expresses exactly (2 hex chars per
# byte). A character-based length(text)/substring oracle silently
# diverges on any multi-byte document.
_KEYFRAME_ORACLE = """
WITH base AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n,
         least(4, greatest(octet_length(encode(text))//256, 1)) AS n_kf
  FROM documents
),
idx AS (SELECT 0 AS kf_idx UNION ALL SELECT 1
        UNION ALL SELECT 2 UNION ALL SELECT 3)
SELECT doc_id,
       idx.kf_idx::INT AS kf_idx,
       n_kf::INT AS n_keyframes,
       (idx.kf_idx * (n // n_kf) * 40)::BIGINT AS pts_ms,
       md5(substring(hx, idx.kf_idx*(n//n_kf)*2 + 1, 32)) AS frame_md5
FROM base JOIN idx ON idx.kf_idx < base.n_kf
"""


def video_keyframes_batch(
    df: DataFrame,
    max_frames: int = 4,
    binary_col: str = "content",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Keyframe extraction over a video blob column — the video tier of
    the multimodal codec family, mirroring the Pillow pattern of
    ``decode_binary_batch``: ``fake=False`` seeks real keyframes with
    pyav when it is importable on the executors (this container ships
    without it) and raises NotImplementedError with the install remedy
    otherwise; ``fake=True`` is a deterministic byte-arithmetic stand-in
    (evenly spaced 'keyframes' at 25 fps, a 16-byte window hashed per
    frame) that keeps the Spark-side plumbing — fan-out mapInPandas,
    Arrow batching, fixed narrow schema — identical across tiers and
    SQL-replayable for the oracle.

    At 100 TB: videos dominate row size, so repartition upstream by
    blob size (``spark.sql.files.maxPartitionBytes`` governs source
    batches) so one Arrow batch's decoded frames fit executor memory;
    the output is narrow metadata — frames should be written by a
    binary-out variant only when a downstream encoder needs pixels."""

    def op(batches):
        import hashlib as _hl

        import pandas as _pd

        def keyframes(data: bytes):
            if not fake:
                try:
                    import io

                    import av
                except ImportError as ex:
                    raise NotImplementedError(
                        "real video keyframe extraction requires pyav "
                        "(pip install av) — not available here; use "
                        "fake=True for the deterministic byte-window "
                        "tier"
                    ) from ex
                out = []
                with av.open(io.BytesIO(data)) as container:
                    vstream = next(
                        s for s in container.streams if s.type == "video"
                    )
                    tb = float(vstream.time_base) if vstream.time_base else 0.0
                    for frame in container.decode(vstream):
                        if not getattr(frame, "key_frame", True):
                            continue
                        pts_ms = int(
                            (frame.pts or 0) * tb * 1000.0
                        )
                        digest = _hl.md5(
                            b"".join(
                                bytes(p) for p in frame.planes
                            )
                        ).hexdigest()
                        out.append((pts_ms, digest))
                        if len(out) >= max_frames:
                            break
                return out
            # Fake tier hashes the UPPERCASE-HEX rendering of each
            # 16-byte window: DuckDB has no md5(BLOB), so the oracle
            # hashes a substring of hex(encode(text)) — byte-exact for
            # any UTF-8 content including multi-byte characters. (The
            # real pyav tier hashes raw plane bytes — tier-internal
            # contract, not oracle-checked.)
            if not data:
                return [(0, _hl.md5(b"").hexdigest())]
            n = len(data)
            n_kf = min(max_frames, max(n // 256, 1))
            stride = n // n_kf
            out = []
            for i in range(n_kf):
                pos = i * stride
                window = data[pos : pos + 16]
                digest = _hl.md5(window.hex().upper().encode()).hexdigest()
                out.append((pos * 40, digest))
            return out

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(data) if data is not None else b""
                kfs = keyframes(data)
                for i, (pts_ms, digest) in enumerate(kfs):
                    rows.append((doc_id, i, len(kfs), pts_ms, digest))
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "kf_idx",
                    "n_keyframes",
                    "pts_ms",
                    "frame_md5",
                ],
            )

    return df.mapInPandas(op, schema=KEYFRAME_SCHEMA)


@register(
    "multimodal_video_keyframes",
    oracle=_KEYFRAME_ORACLE,
    tags=("multimodal", "pandas-udf", "video"),
    expose=False,  # r9: driver-surfaced via multimodal_suite
)
def multimodal_video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe metadata over the documents blob as a fake video
    (deterministic tier; the pyav tier shares the identical plumbing
    and is contract-tested both ways in tests/test_multimodal_codec.py).
    Narrow text-only surface: md5 strings, no raw bytes."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return video_keyframes_batch(d, fake=True)


# --------------------------------------------------------------------------
# Audio tier: feature extraction over a PCM-ish blob column
# --------------------------------------------------------------------------
# Completes the modality triple (image decode/resize, video keyframes,
# AUDIO features). The fake tier reads the blob as signed 8-bit mono
# PCM at 16 kHz and extracts the classic pre-filter features a
# training-data pipeline gates on — energy, zero-crossing rate, peak —
# over a fixed 64-point stride resample (the resize tier's indexing,
# (i*n)//64), so the oracle replays every byte read exactly. The real
# tier decodes with soundfile when importable (not in this container).

AUDIO_SCHEMA = (
    "doc_id bigint, n_bytes int, duration_ms bigint, "
    "energy_sq bigint, zero_crossings bigint, peak bigint"
)

_AUDIO_SAMPLES = 64
_AUDIO_RATE = 16_000


def audio_features_batch(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Audio feature extraction over a blob column (fake PCM tier /
    gated real-soundfile tier, the video_keyframes_batch pattern).
    Output is integer-only, so the SQL oracle comparison is exact.

    At 100 TB: audio rows are large and the output narrow — the Arrow
    batch carries the blob once, features reduce it ~10^6×, and
    everything downstream shuffles bytes-free metadata."""

    def op(batches):
        import numpy as _np
        import pandas as _pd

        def features(data: bytes):
            if not fake:
                try:
                    import io

                    import soundfile  # noqa: F401
                except ImportError as ex:
                    raise NotImplementedError(
                        "real audio decode requires soundfile "
                        "(pip install soundfile) — not available here; "
                        "use fake=True for the deterministic PCM tier"
                    ) from ex
                n = len(data)
                if n == 0:
                    # same contract as the fake tier: empty/NULL blob →
                    # zero row, never a decoder crash failing the job
                    return (0, 0, 0, 0, 0)
                samples, rate = soundfile.read(
                    io.BytesIO(data), dtype="int16"
                )
                s = _np.asarray(samples, dtype=_np.int64)
                if s.ndim > 1:
                    # first channel only: flattening interleaved
                    # (frames, channels) would double duration and
                    # count cross-channel sign flips as crossings
                    s = s[:, 0]
                dur = (len(s) * 1000) // max(rate, 1)
            else:
                n = len(data)
                if n == 0:
                    return (0, 0, 0, 0, 0)
                raw = _np.frombuffer(data, dtype=_np.uint8)
                idx = (_np.arange(_AUDIO_SAMPLES) * n) // _AUDIO_SAMPLES
                # signed 8-bit reinterpretation: ((b+128) % 256) - 128
                s = (
                    (raw[idx].astype(_np.int64) + 128) % 256
                ) - 128
                dur = (n * 1000) // _AUDIO_RATE
            if len(s) == 0:
                return (n, int(dur), 0, 0, 0)
            energy = int((s * s).sum())
            zc = int(((s[1:] < 0) != (s[:-1] < 0)).sum())
            peak = int(_np.abs(s).max())
            return (n, int(dur), energy, zc, peak)

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(data) if data is not None else b""
                n, dur, energy, zc, peak = features(data)
                rows.append((doc_id, n, dur, energy, zc, peak))
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "duration_ms",
                    "energy_sq",
                    "zero_crossings",
                    "peak",
                ],
            )

    return df.mapInPandas(op, schema=AUDIO_SCHEMA)


def _audio_sv(i: "int | str") -> str:
    """Signed byte at resample position i, as the oracle reads it:
    the same (i*n)//64 indexing and ((b+128)%256)-128 reinterpretation
    the fake kernel applies; CASE-guarded so empty blobs never parse
    an empty hex substring."""
    return (
        f"(CASE WHEN n = 0 THEN 0 ELSE "
        f"((('0x' || substring(hx, ((({i})*n)//{_AUDIO_SAMPLES})*2+1, 2))::INT"
        f" + 128) % 256) - 128 END)"
    )


_AUDIO_ORACLE = f"""
WITH base AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id,
       n::INT AS n_bytes,
       CAST((n * 1000) // {_AUDIO_RATE} AS BIGINT) AS duration_ms,
       CAST(CASE WHEN n = 0 THEN 0 ELSE list_aggregate(
           [{_audio_sv('i')} * {_audio_sv('i')}
            for i in range({_AUDIO_SAMPLES})], 'sum') END AS BIGINT)
         AS energy_sq,
       CAST(CASE WHEN n = 0 THEN 0 ELSE list_aggregate(
           [CASE WHEN ({_audio_sv('i')} < 0) != ({_audio_sv('i - 1')} < 0)
                 THEN 1 ELSE 0 END
            for i in range(1, {_AUDIO_SAMPLES})], 'sum') END AS BIGINT)
         AS zero_crossings,
       CAST(CASE WHEN n = 0 THEN 0 ELSE list_aggregate(
           [abs({_audio_sv('i')}) for i in range({_AUDIO_SAMPLES})], 'max')
        END AS BIGINT) AS peak
FROM base
"""


@register(
    "multimodal_audio_features",
    oracle=_AUDIO_ORACLE,
    tags=("multimodal", "pandas-udf", "audio"),
    expose=False,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio features over the documents blob as fake 8-bit PCM
    (deterministic tier; the soundfile tier shares the plumbing and is
    contract-tested both ways). Integer-only output — exact oracle.
    Driver-surfaced through the 'audio' branch of scalar_funcs_suite;
    suite-internal here (the 50-name window)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return audio_features_batch(d, fake=True)


# --------------------------------------------------------------------------
# Perceptual-hash near-duplicate pairs (image dedup plumbing)
# --------------------------------------------------------------------------
# The multimodal member of the dedup family: a pHash-style bit
# signature over the binary content, banded into Hamming buckets, and
# exact bit_count re-ranking of bucket collisions — the pipeline web
# corpora run over images (LAION's pHash/embedding pass). As with the
# decode/resize/audio tiers, the SIGNATURE KERNEL here consumes the
# deterministic stand-in bytes (utf-8 content; a production deployment
# puts the real image decode tier in front — the bucketing, capping
# and re-ranking are codec-independent), which keeps the whole
# operator JVM-side and byte-exact against the SQL replay.
#
# Signature: byte_i of the first _PHASH_BITS bytes (zero-padded) sets
# bit i iff BITS*byte_i > sum(bytes) — the mean threshold compared in
# EXACT INTEGER form (no float mean). Candidate generation: 4 bands ×
# 15 bits; buckets are CAPPED at _PHASH_BUCKET_CAP members (lowest
# doc_ids kept — the LSH df-cap anti-skew guard: shared prefixes make
# popular buckets quadratic otherwise, measured 797k candidate pairs
# at sf0.1 uncapped). Scale shape: one projection builds signatures,
# one explode + one window caps buckets, one self-join on
# (band, value), one bit_count filter — no all-pairs stage anywhere.

_PHASH_BITS = 60
_PHASH_BANDS = 4
_PHASH_BANDW = _PHASH_BITS // _PHASH_BANDS
_PHASH_T = 6  # max Hamming distance for a near-dup pair
_PHASH_BUCKET_CAP = 64

_PHASH_ORACLE = f"""
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx
  FROM documents WHERE text IS NOT NULL
), b AS (
  SELECT doc_id, [CASE WHEN 2*i+2 <= len(hx)
                  THEN ('0x' || substr(hx, 2*i+1, 2))::INT ELSE 0 END
                  for i in range({_PHASH_BITS})] AS bytes
  FROM h
), s AS (
  SELECT doc_id, bytes, list_sum(bytes) AS tot FROM b
), sig AS (
  SELECT doc_id,
         list_aggregate([CASE WHEN {_PHASH_BITS}*bytes[i+1] > tot
                         THEN (1::BIGINT << i) ELSE 0 END
                         for i in range({_PHASH_BITS})], 'sum')::BIGINT
           AS sig
  FROM s
), bands AS (
  SELECT doc_id, sig, band,
         (sig >> (band * {_PHASH_BANDW})) & {(1 << _PHASH_BANDW) - 1} AS bv
  FROM sig, (SELECT unnest(range({_PHASH_BANDS})) AS band)
), capped AS (
  SELECT doc_id, sig, band, bv FROM (
    SELECT doc_id, sig, band, bv,
           ROW_NUMBER() OVER (PARTITION BY band, bv ORDER BY doc_id) AS rk
    FROM bands
  ) WHERE rk <= {_PHASH_BUCKET_CAP}
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b,
       CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
FROM pairs p
JOIN sig sa ON p.doc_a = sa.doc_id
JOIN sig sb ON p.doc_b = sb.doc_id
WHERE bit_count(xor(sa.sig, sb.sig)) <= {_PHASH_T}
"""


@register(
    "multimodal_phash_pairs",
    oracle=_PHASH_ORACLE,
    tags=("multimodal", "dedup", "phash"),
    expose=False,
)
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate binary-content pairs via a pHash-style 60-bit
    mean-threshold signature: banded Hamming buckets (4×15 bits,
    bucket-capped) generate candidates, exact bit_count(xor) <= 6
    (_PHASH_T) re-ranks them. Entirely JVM-side (hex-string byte extraction,
    higher-order-function folds, bit ops) — byte-exact against the
    SQL replay; driver-surfaced through the 'phash' branch of
    join_breadth_suite."""
    from streamlit_flink_demo_spark.plans import track_persist

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    hx = d.select(
        "doc_id", F.hex(F.encode(F.col("text"), "utf-8")).alias("hx")
    )
    bits = _PHASH_BITS
    bytes_expr = (
        f"transform(sequence(0, {bits - 1}), i -> CASE WHEN 2*i+2 <= "
        f"length(hx) THEN CAST(conv(substring(hx, 2*i+1, 2), 16, 10) AS INT) "
        f"ELSE 0 END)"
    )
    sig_expr = (
        f"CAST(aggregate(transform(sequence(0, {bits - 1}), "
        f"i -> CASE WHEN {bits} * element_at(bytes, i + 1) > tot "
        f"THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)"
    )
    sig = track_persist(
        hx.select("doc_id", F.expr(bytes_expr).alias("bytes"))
        .select(
            "doc_id",
            "bytes",
            F.expr("aggregate(bytes, 0, (acc, x) -> acc + x)").alias("tot"),
        )
        .select("doc_id", F.expr(sig_expr).alias("sig"))
    )
    # band value: (sig >> band*W) & mask — the shift amount is the
    # band COLUMN, so the expression is built in SQL form
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(_PHASH_BANDS - 1))).alias(
            "band"
        ),
    ).withColumn(
        "bv",
        F.expr(
            f"shiftright(sig, band * {_PHASH_BANDW}) "
            f"& {(1 << _PHASH_BANDW) - 1}"
        ),
    )
    from pyspark.sql.window import Window as W

    capped = (
        bands.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("band", "bv").orderBy("doc_id")
            ),
        )
        .filter(F.col("rk") <= _PHASH_BUCKET_CAP)
        .select("doc_id", "band", "bv")
    )
    a = capped.select(
        F.col("doc_id").alias("doc_a"), "band", "bv"
    )
    b = capped.select(
        F.col("doc_id").alias("doc_b"), "band", "bv"
    )
    pairs = (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.expr("sig_a ^ sig_b")).cast("bigint").alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= _PHASH_T)
    )
