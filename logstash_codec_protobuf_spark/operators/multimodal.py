"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video content rides as `binary` columns with a metadata struct;
decode / feature-extraction runs as Arrow-batched pandas UDFs over
``mapInPandas`` so each Python worker sees whole record batches (the only sane
shape at 100 TB — never per-row Python).

The decode step itself is STUBBED: the container has no image/audio libraries,
so ``decode_image`` raises NotImplementedError unless PIL is importable, and
the default feature extractor computes deterministic fake features (byte
length, prefix checksum, derived width/height). The Spark-side plumbing —
schema, Arrow batch iteration, partitioning — is real and tested, and the fake
features are reproducible in SQL, giving the plumbing an exact oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.portable import DUCK, MOD

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

try:  # real decoders, if the environment has them
    from PIL import Image  # noqa: F401
    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def decode_image(payload: bytes):
    """Real image decode — gated on an optional dependency."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this environment ships without image "
            "libraries — use extract_features (deterministic stub) instead"
        )
    import io
    return Image.open(io.BytesIO(payload))


def _prefix_checksum(payload: bytes, n: int = 16) -> int:
    acc = 0
    for byte in payload[:n]:
        acc = (acc * 31 + byte) % MOD
    return acc


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Demo media table: utf-8 bytes of `text` stand in for image bytes."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def extract_features(media: DataFrame, batch_hint: int | None = None,
                     real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``real_decode=True`` (requires PIL; callers opt in when payloads hold
    real image bytes) decodes each payload and reports actual pixel
    dimensions; the default computes deterministic stub features — n_bytes,
    16-byte prefix polynomial checksum, width/height derived from both.
    Either way the Spark plumbing — mapInPandas Arrow batches, schema,
    partition-preserving 1:1 shape — is identical; the stub keeps an exact
    SQL oracle (features_oracle)."""

    def _stub_row(pdf: pd.DataFrame) -> pd.DataFrame:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        checksum = payloads.map(_prefix_checksum)
        return pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "n_bytes": n_bytes.astype("int64"),
            "checksum": pd.Series(checksum, dtype="int64"),
            "width": (64 + n_bytes % 512).astype("int32"),
            "height": (64 + pd.Series(checksum) % 512).astype("int32"),
        })

    def _stub_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _stub_row(pdf)

    def _pil_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _stub_row(pdf)
            widths, heights = [], []
            for p in pdf["payload"]:
                img = decode_image(bytes(p))
                widths.append(img.width)
                heights.append(img.height)
            out["width"] = pd.Series(widths, dtype="int32")
            out["height"] = pd.Series(heights, dtype="int32")
            yield out

    if real_decode and not HAS_PIL:
        raise NotImplementedError("real_decode=True requires PIL")
    fn = _pil_batch if real_decode else _stub_batch
    return media.mapInPandas(fn, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_len", T.IntegerType()),
    T.StructField("frame_checksum", T.LongType()),
])

FRAME_BYTES = 64  # fake "frame" stride over the opaque payload


def sample_frames(media: DataFrame, stride: int = FRAME_BYTES,
                  every: int = 2, max_frames: int = 256) -> DataFrame:
    """Frame sampling over opaque binary payloads (the video path's shape):
    split each payload into ``stride``-byte frames, keep every ``every``-th
    one, emit per-frame metadata + checksum. 1:N mapInPandas — Arrow batches
    in, exploded frame rows out, no shuffle (real video decode would swap
    into the same loop via PyAV/ffmpeg; the container ships neither, so the
    frame splitter is the deterministic stand-in with an exact oracle)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                n_frames = (len(buf) + stride - 1) // stride
                if n_frames > max_frames:
                    # The SQL oracle enumerates a constant 0..max_frames-1
                    # range; a payload past the bound would emit Spark rows
                    # the oracle can't — fail the job instead of silently
                    # diverging. Callers size max_frames to the corpus.
                    raise ValueError(
                        f"payload for doc {doc_id} has {n_frames} frames "
                        f"> max_frames={max_frames}; raise max_frames"
                    )
                for i in range(0, n_frames, every):
                    chunk = buf[i * stride:(i + 1) * stride]
                    acc = 0
                    for b in chunk[:16]:
                        acc = (acc * 31 + b) % MOD
                    rows.append((int(doc_id), i, len(chunk), acc))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return media.mapInPandas(_frames, FRAME_SCHEMA)


def frames_oracle(stride: int = FRAME_BYTES, every: int = 2,
                  max_frames: int = 256) -> str:
    """Exact SQL twin of the frame sampler (ASCII text: chars == bytes).
    generate_series can't be row-correlated in DuckDB, so the series is a
    constant 0..max_frames-1 range filtered to frames that exist."""
    d = DUCK
    start = f"(g.i * {stride} + 1)"
    chunk = f"substring(text, {start}, {stride})"
    checksum = d.poly_hash_str(f"substring({chunk}, 1, 16)")
    return f"""
SELECT doc_id, CAST(g.i AS INTEGER) AS frame_idx,
       CAST(length({chunk}) AS INTEGER) AS frame_len,
       {checksum} AS frame_checksum
FROM documents
CROSS JOIN generate_series(0, {max_frames - 1}) g(i)
WHERE g.i * {stride} < length(text) AND g.i % {every} = 0
"""


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
    T.StructField("scale_ppm", T.LongType()),  # scale in parts-per-million
])


def resize_images(media: DataFrame, max_side: int = 128,
                  real_decode: bool = False) -> DataFrame:
    """Aspect-preserving resize planning over binary payloads: compute the
    target (out_width, out_height) that fits ``max_side`` — the metadata
    half of an image-resize stage, over the stub dimensions (or real PIL
    dimensions + actual resample when ``real_decode``). The scale factor is
    reported in integer parts-per-million so the oracle is exact (a double
    ratio column would be fine too — this keeps it integral)."""
    if real_decode and not HAS_PIL:
        raise NotImplementedError("real_decode=True requires PIL")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if real_decode:  # pragma: no cover - needs PIL
                    img = decode_image(buf)
                    w, h = img.width, img.height
                else:
                    n = len(buf)
                    c = _prefix_checksum(buf)
                    w, h = 64 + n % 512, 64 + c % 512
                scale_ppm = min(max_side * 1_000_000 // max(w, h), 1_000_000)
                ow = w * scale_ppm // 1_000_000
                oh = h * scale_ppm // 1_000_000
                rows.append((int(doc_id), w, h, ow, oh, scale_ppm))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA])

    return media.mapInPandas(_resize, RESIZE_SCHEMA)


def resize_oracle(max_side: int = 128) -> str:
    """Exact SQL twin of the stub resize planner (integer arithmetic only)."""
    d = DUCK
    checksum = d.poly_hash_str("substring(text, 1, 16)")
    w = f"(64 + octet_length(encode(text)) % 512)"
    h = f"(64 + ({checksum}) % 512)"
    scale = (f"LEAST({max_side} * 1000000 // "
             f"GREATEST({w}, {h}), 1000000)")
    return f"""
SELECT doc_id, CAST({w} AS INTEGER) AS width, CAST({h} AS INTEGER) AS height,
       CAST({w} * ({scale}) // 1000000 AS INTEGER) AS out_width,
       CAST({h} * ({scale}) // 1000000 AS INTEGER) AS out_height,
       CAST({scale} AS BIGINT) AS scale_ppm
FROM documents
"""


def features_oracle() -> str:
    """Exact SQL twin of the stub extractor (documents text is ASCII, so
    char codes == utf-8 bytes)."""
    d = DUCK
    checksum = d.poly_hash_str("substring(text, 1, 16)")
    return f"""
SELECT doc_id, 'image/fake' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       {checksum} AS checksum,
       CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS width,
       CAST(64 + {checksum} % 512 AS INTEGER) AS height
FROM documents
"""
