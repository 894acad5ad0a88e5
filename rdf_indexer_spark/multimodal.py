"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
``mapInPandas`` kernels, Arrow batch shapes; the actual media decode is
stubbed deterministically (image/audio libraries are not in this container),
clearly marked, and swappable for PIL/ffmpeg kernels on a real cluster.

Layout convention (matches common lakehouse practice):
    media(doc_id long, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int,
                      n_frames:int, codec:string>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

FEATURE_SCHEMA = "doc_id long, kind string, feature array<float>, feat_dim int"


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB: deterministic fake decode (no media libs in this container).

    Real deployment swaps this for PIL.Image.open / soundfile.read — the
    surrounding Arrow batching, schema, and partitioning do not change.
    The fake is deterministic in the payload bytes so tests are stable."""
    rng = np.random.default_rng(np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64))
    if kind == "image":
        return rng.random((8, 8, 3), dtype=np.float32)
    if kind == "audio":
        return rng.random(256, dtype=np.float32)
    raise NotImplementedError(f"decode for kind={kind!r} requires media libs")


def extract_features(media: DataFrame, batch_limit: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: decode → pooled feature vector.

    Arrow batches stream through the Python worker; nothing is collected,
    partitioning is preserved (narrow transformation)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                arr = _decode_stub(bytes(payload), kind)
                pooled = arr.reshape(-1)[:32].astype(np.float32)
                feats.append(pooled.tolist())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "feat_dim": [len(f) for f in feats],
            })

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame index.

    Frame *extraction* is stubbed; the explode shape (1 row → n_frames/every_n
    rows) is the real contract a downstream trainer consumes."""
    n_frames = F.col("meta.n_frames")
    return media.filter(F.col("kind") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
        F.lit(None).cast("binary").alias("frame_payload"),  # stub: extractor output
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing via mapInPandas (decode+resize stubbed)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            metas = []
            for m in pdf["meta"]:
                d = dict(m) if m is not None else {}
                d["width"], d["height"] = width, height
                metas.append(d)
            out["meta"] = metas
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, schema=MEDIA_SCHEMA
    )
