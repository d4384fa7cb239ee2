"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` kernels.

The decode step is STUBBED (this container ships no image/audio codecs):
``decode_image`` raises ``NotImplementedError`` unless a decoder library
is importable, and ``fake_decode_features`` provides a deterministic
byte-histogram "decoder" so the Spark-side plumbing — schema, batching,
partition parallelism, UDF signatures — is real and testable end-to-end.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so batch_bytes ≈
rows × payload fits executor memory. Feature extraction is embarrassingly
parallel — zero shuffles in this module.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# asset = one media object; metadata is typed, payload is opaque binary
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes int, "
    "byte_entropy double, features array<float>"
)


def _try_import_pillow():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes):
    """Real image decode — stub: the container has no codec libraries.

    Cite: this mirrors how the reference gates optional behavior behind
    runtime checks rather than hard deps (defensive parsing throughout
    `iis_etl/logic.py:23-56`). Swap in PIL/torchvision on a real cluster.
    """
    pillow = _try_import_pillow()
    if pillow is None:
        raise NotImplementedError(
            "image decode requires a codec library (PIL) not present in "
            "this container; use fake_decode_features for plumbing tests"
        )
    import io as _io

    return pillow.open(_io.BytesIO(payload))


def fake_decode_features(docs: DataFrame, n_features: int = 16) -> DataFrame:
    """Deterministic stand-in decoder: byte histogram (n_features buckets,
    L1-normalized) + byte entropy per asset. Exercises the exact plumbing
    a real decoder uses (binary in Arrow batches → numpy → feature array
    column); only the kernel body changes on a real cluster."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                buf = r["payload"]
                if buf is None or len(buf) == 0:
                    rows.append(
                        (r["asset_id"], r["media_type"], 0, 0.0,
                         np.zeros(n_features, dtype=np.float32))
                    )
                    continue
                arr = np.frombuffer(buf, dtype=np.uint8)
                hist = np.bincount(arr >> 4 if n_features == 16 else arr % n_features,
                                   minlength=n_features).astype(np.float64)
                probs = hist / hist.sum()
                nz = probs[probs > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                rows.append(
                    (
                        r["asset_id"],
                        r["media_type"],
                        int(len(arr)),
                        round(entropy, 6),
                        (hist / hist.sum()).astype(np.float32),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "media_type", "n_bytes", "byte_entropy", "features",
                ],
            )

    return docs.select(
        "asset_id", "media_type", "payload"
    ).mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, frame_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """'Video' frame sampling over the opaque payload: split the binary
    into fixed-size chunks and emit up to max_frames evenly-spaced
    (asset_id, frame_idx, frame payload) rows — the partition/explode
    shape of a real frame sampler, with byte-slicing standing in for
    actual video decode."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                buf = r["payload"] or b""
                n_frames = max(len(buf) // frame_bytes, 1)
                step = max(n_frames // max_frames, 1)
                for i, f in enumerate(range(0, n_frames, step)[:max_frames]):
                    out.append(
                        (r["asset_id"], i, buf[f * frame_bytes : (f + 1) * frame_bytes])
                    )
            yield pd.DataFrame(out, columns=["asset_id", "frame_idx", "frame"])

    return assets.select("asset_id", "payload").mapInPandas(
        sample, "asset_id long, frame_idx int, frame binary"
    )


def resize_images(
    assets: DataFrame, target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """Image resize kernel: (asset_id, width, height, payload) with the
    payload re-encoded at target dimensions.

    With a codec (PIL) present, payloads that decode as images go through
    a real `Image.resize` (PNG re-encode); payloads that don't (and every
    payload in this codec-less container) fall back per-row to a
    deterministic byte-stride downsample — payload strided to exactly
    target_w*target_h bytes (cycled when the source is smaller) — so the
    Spark plumbing (binary in/out through Arrow, metadata column rewrite,
    per-partition batching) is identical to production and fully testable
    on any host.
    """
    pillow = _try_import_pillow()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                buf = r["payload"] or b""
                resized = None
                if pillow is not None and len(buf) > 0:
                    import io as _io

                    try:
                        img = pillow.open(_io.BytesIO(buf)).resize(
                            (target_w, target_h)
                        )
                        sink = _io.BytesIO()
                        img.save(sink, format="PNG")
                        resized = sink.getvalue()
                    except Exception:
                        resized = None  # not an image — stride fallback
                if resized is not None:
                    pass
                elif len(buf) == 0:
                    resized = b"\x00" * n_out
                else:
                    arr = np.frombuffer(buf, dtype=np.uint8)
                    idx = (np.arange(n_out) * len(arr) // n_out) % len(arr)
                    resized = arr[idx].tobytes()
                out.append((r["asset_id"], target_w, target_h, resized))
            yield pd.DataFrame(
                out, columns=["asset_id", "width", "height", "payload"]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        resize, "asset_id long, width int, height int, payload binary"
    )


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Adaptor: treat the documents fixture's text bytes as opaque media
    payloads so the multimodal plumbing is testable on driver data."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.lit(None).cast("string").alias("codec"),
    )
