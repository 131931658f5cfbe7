"""Multimodal column plumbing: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed in Arrow-batched
``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernel is a
deterministic STUB (clearly marked) — but everything Spark-side is real:
schema contract, batch iteration, partition parallelism, and the pattern a
real decoder drops into (swap `_fake_decode` for PIL/libav and nothing
else changes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, format string"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a fake binary payload column (UTF-8 bytes of the text) —
    stands in for an image/audio blob column in the testdata, which has
    no true binary column."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """STUB decode: deterministic pseudo-metadata from the byte length.
    A real pipeline replaces this with PIL.Image.open / soundfile /
    pyav frame extraction — per-batch, inside the same mapInPandas."""
    n = len(payload)
    return n, (n % 640) + 1, (n % 480) + 1, "fake"


def decode_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, payload) partitions.

    Each batch is a pandas DataFrame; the kernel is vectorized per batch
    (python-side, but amortized over thousands of rows per Arrow batch).
    Output: typed metadata per blob.
    """
    from .util import ensure_parallelism

    src = ensure_parallelism(df.select(F.col(id_col).alias("doc_id"), "payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": meta.map(lambda m: m[0]),
                    "width": meta.map(lambda m: m[1]),
                    "height": meta.map(lambda m: m[2]),
                    "format": meta.map(lambda m: m[3]),
                }
            )

    return src.mapInPandas(kernel, DECODE_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """STUB frame sampler: emits one row per sampled "frame" offset —
    the explode-shaped plumbing of video frame extraction (1 input row ->
    n output rows) without a codec. Real version: pyav keyframe iteration
    inside mapInPandas with the same output contract."""
    return df.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.length("payload") / every_n_bytes).cast("int") - 1, F.lit(0)
                ),
            )
        ).alias("frame_idx"),
    )


def extract_byte_histogram(
    df: DataFrame, id_col: str = "doc_id", buckets: int = 16
) -> DataFrame:
    """Feature extraction over binary payloads: bucketed byte histogram
    (numpy bincount per Arrow batch) exploded to (id, bucket, n) rows.
    Unlike the decode stub this is a REAL feature computation — byte
    histograms are a standard cheap signal for format sniffing and
    corruption detection — and it is exactly oracle-checkable. The same
    mapInPandas contract carries a CNN embedding or MFCC extractor at
    scale: payloads never shuffle; only (id, small-feature) rows do."""
    import numpy as np

    from .util import ensure_parallelism

    src = ensure_parallelism(df.select(F.col(id_col).alias("doc_id"), "payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bks, ns = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8) % buckets
                counts = np.bincount(arr, minlength=buckets)
                nz = np.nonzero(counts)[0]
                ids.extend([doc_id] * len(nz))
                bks.extend(nz.tolist())
                ns.extend(counts[nz].tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "bucket": bks, "n": ns},
            ).astype({"doc_id": "int64", "bucket": "int32", "n": "int64"})

    return src.mapInPandas(kernel, "doc_id bigint, bucket int, n bigint")


def resize_stub(
    df: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """STUB image resize: binary in -> binary out through mapInPandas,
    emitting a deterministic payload of target_w*target_h//8 bytes (a
    real pipeline swaps the kernel body for PIL thumbnail/resample and
    keeps the identical schema contract). Proves the binary-column
    round-trip: Arrow handles bytes in both directions, and the resized
    blob column is writable/joinable like any other."""
    out_len = target_w * target_h // 8

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                bytes((p * (out_len // max(len(p), 1) + 1))[:out_len])
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "resized": resized,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        kernel, "doc_id bigint, width int, height int, resized binary"
    )
