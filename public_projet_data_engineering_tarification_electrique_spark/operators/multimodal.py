"""Multimodal column plumbing (extension surface): media as opaque
``binary`` columns + typed metadata, processed by Arrow-batched
``mapInPandas``.

The decode step is STUBBED (this container has no image/audio libs):
``fake_decode_meta`` derives deterministic metadata from the raw bytes,
and ``decode_image`` raises NotImplementedError unless a real decoder
is importable. The Spark-side plumbing — binary schema, Arrow batch
shape, mapInPandas signature, partition-parallel execution — is real
and oracle-tested (the fake decode is a pure function of the bytes, so
DuckDB can verify it).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import ensure_parallelism

#: Deterministic fake formats keyed by id % 3 (stands in for sniffing
#: magic bytes in a real decoder).
_FORMATS = ("png", "jpg", "webp")

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, format string"
)


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque media payload.

    In a real pipeline this column comes straight from parquet/tar
    shards of images/audio; binary stays opaque to Catalyst and is
    never shuffled except where the plan requires the payload itself.

    NULL-text rows are dropped here: a NULL payload has no media
    semantics, and letting it through would crash the Arrow batch
    functions downstream (len(None)/bytes(None)) instead of the
    explicit decision this filter records.
    """
    return (
        ensure_parallelism(docs)
        .filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("payload")
        )
    )


def extract_media_meta(with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    mapInPandas streams RecordBatches through Python once, partition
    parallel — the pattern a real decode/resize/feature-extract step
    uses. The metadata here is a deterministic function of the bytes
    (see module docstring).
    """

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int32"),
                    "width": (64 + n_bytes % 64).astype("int32"),
                    "height": (64 + (n_bytes // 64) % 64).astype("int32"),
                    "format": [
                        _FORMATS[int(i) % 3] for i in pdf[id_col].to_numpy()
                    ],
                }
            )

    return with_payload.mapInPandas(meta_batches, schema=MEDIA_META_SCHEMA)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real image decode — unavailable in this environment.

    Gate: import Pillow if present, else explicit NotImplementedError so
    callers fail loudly rather than silently skipping decode.
    """
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires Pillow, not installed in this container"
        ) from exc


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"
FEATURE_SCHEMA = "doc_id long, features array<long>"


def frame_sample(
    with_payload: DataFrame,
    frame_bytes: int = 64,
    max_frames: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling plumbing: explode each payload into up to
    ``max_frames`` fixed-width byte windows (the stand-in for video
    keyframe extraction — a real decoder swaps the window slicing for
    codec frame boundaries; the 1→N Arrow fan-out shape is identical).

    Output grain: one row per (doc, frame). At 100 TB the payload column
    never shuffles — mapInPandas runs on the scan's partitions and only
    the (much smaller) sampled frames flow on.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            blobs: list[bytes] = []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                n = min(max(1, len(b) // frame_bytes), max_frames)
                for i in range(n):
                    ids.append(int(did))
                    idxs.append(i)
                    blobs.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": blobs}
            )

    return with_payload.mapInPandas(frames, schema=FRAME_SCHEMA)


def byte_histogram_features(
    with_payload: DataFrame, n_bins: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """REAL feature extraction over the binary column: an ``n_bins``-bin
    byte-value histogram per payload as ``array<long>`` (numpy bincount
    per Arrow batch — no per-byte Python). This is the embedding-shaped
    output a learned feature extractor would produce, with the same
    schema, batching, and partition-parallelism."""
    import numpy as np

    if 256 % n_bins != 0:
        raise ValueError(f"n_bins must divide 256, got {n_bins}")
    shrink = 256 // n_bins

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                feats.append(
                    np.bincount(arr // shrink, minlength=n_bins)
                    .astype("int64")
                    .tolist()
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "features": feats})

    return with_payload.mapInPandas(hist, schema=FEATURE_SCHEMA)


def resize_image(payload: bytes, width: int, height: int):  # pragma: no cover - stub
    """Real image resize — requires a decoder, absent here (see
    decode_image). Kept as a loud stub so the operator surface is
    explicit about what a deployment must provide."""
    img = decode_image(payload)  # raises NotImplementedError without Pillow
    return img.resize((width, height))
