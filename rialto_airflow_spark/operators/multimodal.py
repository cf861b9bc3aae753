"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow batches.

Design (the part that matters at 100 TB): binary payloads ride in
parquet binary columns next to their metadata; all per-item compute
runs through mapInPandas so Arrow moves whole batches across the
Python boundary once, and partitioning is by content hash so skewed
producers don't hot-spot an executor. The decode step itself is
STUBBED here (no image/audio libraries in this container) behind
``NotImplementedError`` / deterministic fakes — the Spark-side
plumbing (schema, batch shape, UDF signature, partitioning) is real
and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metadata carried alongside every binary payload
MEDIA_META_DDL = (
    "media_id bigint, kind string, content binary, n_bytes long, "
    "content_md5 string"
)

FEATURE_DDL = (
    "media_id bigint, kind string, n_bytes long, content_md5 string, "
    "magic_int long, feature string"
)


def attach_binary(df: DataFrame, id_col: str, payload_col: str, kind: str) -> DataFrame:
    """Wrap a payload column as an opaque binary media column with
    typed metadata (id, kind, byte length, content hash). For real
    media the payload arrives as bytes from the source; here any
    string column can stand in (encoded utf-8)."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        content.alias("content"),
        F.length(content).cast("long").alias("n_bytes"),
        F.md5(content).alias("content_md5"),
    )


def decode_media(content: bytes, kind: str) -> dict:
    """STUB — the real decoder (PIL/ffmpeg/soundfile) is not in this
    container. Deterministic fake: 'decodes' to the first 8 bytes as
    a big-endian int plus a synthetic feature tag. Raises for kinds
    that would need a true codec path."""
    if kind not in ("image", "audio", "video", "text"):
        raise NotImplementedError(f"no decoder for kind={kind}")
    magic = int.from_bytes(content[:8].ljust(8, b"\0"), "big", signed=False) >> 1
    return {"magic_int": magic, "feature": f"{kind}:{hashlib.md5(content).hexdigest()[:8]}"}


def extract_features(
    df: DataFrame,
    decode: Callable[[bytes, str], dict] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over media rows
    (mapInPandas): one Python crossing per batch, schema declared up
    front so the plan stays typed.

    The decoder is TRANSPORT-INJECTED, mirroring the connector seam in
    ``sources.ingest``: ``decode(content_bytes, kind) -> {"magic_int":
    int, "feature": str}``. The default is the container-limitation
    stub :func:`decode_media`; a production deployment passes a real
    PIL/ffmpeg/soundfile callable (serialized to executors with the
    closure) without touching any plan code."""
    decode = decode or decode_media

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(c, k) for c, k in zip(pdf["content"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "content_md5": pdf["content_md5"],
                    "magic_int": [f["magic_int"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )

    return df.mapInPandas(batches, FEATURE_DDL)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resize: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize pipeline stage with an injected codec, same seam as
    :func:`extract_features`: ``resize(content, w, h) -> bytes``
    (decode + resize + re-encode in one call). Default is a
    pass-through fake (no codec libs in this container); the
    pass-through schema + target-size metadata plumbing is real either
    way, and byte-length/hash metadata are recomputed from the
    returned payload."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            if resize is not None:
                new_content = [resize(c, width, height) for c in pdf["content"]]
                out["content"] = new_content
                out["n_bytes"] = [len(c) for c in new_content]
                out["content_md5"] = [
                    hashlib.md5(c).hexdigest() for c in new_content
                ]
            out["target"] = f"{width}x{height}"
            yield out

    schema = MEDIA_META_DDL + ", target string"
    return df.mapInPandas(batches, schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-offset sampling: fan each media row out to one row per
    sampled 'frame' offset (a real video path would demux the payload
    at these offsets).

    The fan-out is pure built-in algebra — ``explode(sequence(...))``
    — so it stays inside whole-stage codegen with ZERO Python in the
    plan; at 100 TB that matters on every media row. When a real
    demuxer needs the payload bytes per frame, use
    :func:`demux_frames`, which keeps this row multiplication
    vectorized inside the Arrow batch."""
    n = F.greatest(
        (F.col("n_bytes") / F.lit(every_n_bytes)).cast("long"), F.lit(1)
    )
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0).cast("long"), n - 1)).alias("__f"),
    ).select(
        "media_id",
        F.col("__f").cast("int").alias("frame_idx"),
        (F.col("__f") * every_n_bytes).cast("long").alias("offset"),
    )


def demux_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """STUB demux path: same 1→N fan-out as :func:`sample_frames` but
    through mapInPandas, the shape a real frame decoder needs (the
    payload bytes are only reachable Python-side). Fully vectorized
    inside each Arrow batch — the ragged per-row aranges are built
    with ``np.repeat`` / cumulative offsets, no per-row Python loop."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = np.maximum(
                pdf["n_bytes"].to_numpy(dtype=np.int64) // every_n_bytes, 1
            )
            total = int(n.sum())
            starts = np.repeat(np.cumsum(n) - n, n)
            idx = np.arange(total, dtype=np.int64) - starts
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(
                        pdf["media_id"].to_numpy(dtype=np.int64), n
                    ),
                    "frame_idx": idx.astype(np.int32),
                    "offset": idx * every_n_bytes,
                }
            )

    return df.mapInPandas(batches, "media_id bigint, frame_idx int, offset long")
