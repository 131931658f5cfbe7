"""Multimodal column plumbing: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed in Arrow-batched
``mapInPandas`` stages.

Kernel tiers, chosen per payload at runtime:

1. REAL PNG path — payloads carrying the PNG magic are decoded with PIL
   when importable, else the pure stdlib+numpy codec in
   :mod:`.png` (8-bit gray/RGB/RGBA, the normalized-corpus subset).
   Exercised end-to-end in tests on generated PNGs.
2. STUB path — non-image payloads (e.g. the testdata's UTF-8 text blobs)
   get deterministic pseudo-metadata/pseudo-resize so the Spark plumbing
   (schema contract, Arrow batch iteration, binary round-trip, partition
   parallelism) is still fully testable and oracle-checkable.

Audio is REAL via the stdlib WAV/RIFF codec in :mod:`.audio` (header
parse, PCM decode, frame sampling — the m7/m8 chain), and video is REAL
via the uncompressed-AVI codec in :mod:`.avi` (RIFF chunk walk, DIB
frame decode — the m9/m10 chain). Every modality now has a real
end-to-end path; the stubs here remain only as the documented
mixed-corpus fallback for undecodable payloads.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .util import lineage_checkpoint

from . import png as _png

try:  # preferred real codec when the environment provides it
    from PIL import Image as _PILImage  # noqa: N812
except ImportError:  # pure-numpy fallback (this sandbox)
    _PILImage = None

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
    Used for non-image payloads; PNG payloads take the real header
    parse in :func:`_decode_one`."""
    n = len(payload)
    return n, (n % 640) + 1, (n % 480) + 1, "fake"


def _decode_one(payload: bytes) -> tuple[int, int, int, str]:
    """Per-blob metadata: REAL for PNG (O(1) IHDR parse — width/height
    without touching pixel data), stub pseudo-metadata otherwise."""
    if _png.is_png(payload):
        try:
            w, h, _, _ = _png.png_header(payload)
            return len(payload), w, h, "png"
        except ValueError:
            return len(payload), 0, 0, "corrupt-png"
    return _fake_decode(payload)


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
            meta = pdf["payload"].map(_decode_one)
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
    the explode-shaped plumbing of frame extraction (1 input row ->
    n output rows) without a codec. Real versions of this contract are
    shipped: :func:`.audio.wav_frame_sample` (decoded PCM frames, m8)
    and :func:`.avi.avi_frame_sums` (decoded video frames, m10); this
    stub stays as the payload-agnostic fallback the m2 oracle checks."""
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


def _resize_png(payload: bytes, target_w: int, target_h: int) -> bytes:
    """REAL resize kernel for one PNG blob: decode -> nearest-neighbor
    resample -> re-encode. PIL when importable (NEAREST, to match the
    fallback's pixel-center math); else the pure-numpy codec. Raises
    ValueError on PNGs outside the supported subset — the caller decides
    the fallback policy. The supported-mode set is pinned to the 8-bit
    gray/LA/RGB/RGBA subset of the numpy codec so PIL and fallback
    environments classify every payload identically (a palette or 16-bit
    PNG stubs in BOTH, instead of silently decoding under PIL only)."""
    if _PILImage is not None:
        import io

        import numpy as np

        with _PILImage.open(io.BytesIO(payload)) as im:
            if im.mode not in ("L", "LA", "RGB", "RGBA"):
                raise ValueError(f"unsupported PNG mode {im.mode}")
            arr = np.asarray(im)
        out = _png.resize_nearest(arr, target_w, target_h)
        return _png.png_encode(out)
    arr = _png.png_decode(payload)
    return _png.png_encode(_png.resize_nearest(arr, target_w, target_h))


def resize_images(
    df: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Image resize over a binary column: PNG payloads take the REAL
    decode->resample->encode kernel (:func:`_resize_png`); anything else
    falls back to the deterministic stub payload so mixed-modality
    corpora don't fail the batch. Output schema is identical to
    :func:`resize_stub` plus a ``kernel`` column recording which path
    each row took ('png' | 'stub') — the honest-labeling contract for a
    corpus where only some blobs are decodable images."""
    stub_len = target_w * target_h // 8

    def one(payload: bytes) -> tuple[bytes, str]:
        if _png.is_png(payload):
            try:
                return _resize_png(payload, target_w, target_h), "png"
            # ValueError: outside the supported subset; zlib/struct
            # errors: magic-valid but malformed stream (corrupt IDAT /
            # truncated chunk) — all stub, per the mixed-modality
            # "don't fail the batch" contract.
            except (ValueError, zlib.error, struct.error):
                pass
        return (
            bytes((payload * (stub_len // max(len(payload), 1) + 1))[:stub_len]),
            "stub",
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "resized": [p[0] for p in pairs],
                    "kernel": [p[1] for p in pairs],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        kernel,
        "doc_id bigint, width int, height int, resized binary, kernel string",
    )


def text_to_png_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    side: int = 8,
) -> DataFrame:
    """Deterministic grayscale PNG per row: pixel (y, x) = codepoint of
    the text's character ``y*side + x`` masked to a byte, zero-padded
    past the end. This manufactures REAL image payloads from the text
    testdata so the real codec path is exercisable (and, because the
    pixel rule is pure character arithmetic, an SQL oracle can predict
    pixel-level results of downstream image ops without being able to
    produce PNG bytes)."""
    import numpy as np

    from .util import ensure_parallelism

    n = side * side
    src = ensure_parallelism(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf["_t"]:
                vals = [ord(c) & 0xFF for c in (t or "")[:n]]
                vals += [0] * (n - len(vals))
                arr = np.array(vals, dtype=np.uint8).reshape(side, side)
                payloads.append(_png.png_encode(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return src.mapInPandas(kernel, "doc_id bigint, payload binary")


def png_pixel_stats(
    df: DataFrame, payload_col: str = "resized"
) -> DataFrame:
    """Decode PNG payloads and emit exact pixel statistics — the
    verification tail of the real-codec chain (encode -> resize ->
    decode must reproduce the pixels the resample math predicts)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, sums = [], [], []
            for p in pdf[payload_col]:
                arr = _png.png_decode(bytes(p))
                h, w = arr.shape[:2]
                ws.append(w)
                hs.append(h)
                sums.append(int(arr.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": ws,
                    "height": hs,
                    "pixel_sum": sums,
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        kernel, "doc_id bigint, width int, height int, pixel_sum bigint"
    )


def resize_stub(
    df: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """STUB image resize: binary in -> binary out through mapInPandas,
    emitting a deterministic payload of target_w*target_h//8 bytes (the
    real-codec variant is :func:`resize_images`; this one keeps a fully
    payload-independent contract for the m5 oracle). Proves the
    binary-column round-trip: Arrow handles bytes in both directions, and
    the resized blob column is writable/joinable like any other."""
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


def mixed_modality_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Manufacture a MIXED-modality corpus: one binary column whose rows
    are real PNG (doc_id % 3 == 0), real WAV (== 1), or real AVI (== 2)
    payloads, each generated from the row's text by the same character
    arithmetic as the single-modality builders (m6/m7/m9) — the input
    shape of a production multimodal table, where one column carries
    whatever bytes arrived."""
    import numpy as np

    from .audio import MAX_FRAMES as _WAV_MAX
    from .audio import _encode_wav, _rate_for
    from .avi import FRAME_CHARS, MAX_FRAMES, SIDE, _fps_for, avi_encode
    from .util import ensure_parallelism

    src = ensure_parallelism(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, t in zip(pdf["doc_id"], pdf["_t"]):
                s = t or ""
                mod = doc_id % 3
                if mod == 0:  # PNG: first 64 codepoints as 8x8 gray
                    vals = [ord(c) & 0xFF for c in s[:64]]
                    vals += [0] * (64 - len(vals))
                    arr = np.array(vals, dtype=np.uint8).reshape(8, 8)
                    payloads.append(_png.png_encode(arr))
                elif mod == 1:  # WAV: m7's encoder rule
                    vals = [
                        ((ord(c) & 0xFF) - 128) * 256 for c in s[:_WAV_MAX]
                    ]
                    payloads.append(
                        _encode_wav(
                            np.array(vals, dtype=np.int16), _rate_for(doc_id)
                        )
                    )
                else:  # AVI: m9's encoder rule
                    cut = s[: FRAME_CHARS * MAX_FRAMES]
                    n_frames = (len(cut) + FRAME_CHARS - 1) // FRAME_CHARS
                    vals = [ord(c) & 0xFF for c in cut]
                    vals += [0] * (n_frames * FRAME_CHARS - len(vals))
                    frames = np.array(vals, dtype=np.uint8).reshape(
                        n_frames, SIDE, SIDE
                    )
                    payloads.append(avi_encode(frames, _fps_for(doc_id)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return src.mapInPandas(kernel, "doc_id bigint, payload binary")


def decode_any_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-number DISPATCH over a mixed binary column — the operator a
    real multimodal pipeline runs first: classify each payload (PNG /
    WAV / AVI / unknown) and run the matching REAL decoder. Output is a
    unified schema: (modality, dim_a, dim_b, content_sum) where the
    dims/sum are format-specific but all fully decoded —

      png: width, height, pixel sum of the decoded raster
      wav: frame count, sample rate (header), PCM sample sum
      avi: frame count, usec-per-frame (header), all-frame pixel sum
      unknown payloads pass through as ('unknown', 0, byte length, 0)
      instead of failing the batch (the mixed-corpus contract)."""
    import io as _io
    import wave as _wave

    import numpy as np

    from .audio import is_wav
    from .avi import avi_decode, is_avi

    def one(p: bytes) -> tuple[str, int, int, int]:
        # Per-payload guard: a recognized magic with a malformed body must
        # degrade to the 'unknown' row, not fail the whole Arrow batch —
        # the mixed-corpus contract promised in the docstring.
        try:
            if _png.is_png(p):
                arr = _png.png_decode(p)
                h, w = arr.shape[:2]
                return "png", w, h, int(arr.sum())
            if is_wav(p):
                with _wave.open(_io.BytesIO(p), "rb") as wv:
                    n = wv.getnframes()
                    rate = wv.getframerate()
                    raw = wv.readframes(n)
                return "wav", n, rate, int(
                    np.frombuffer(raw, dtype="<i2").sum()
                )
            if is_avi(p):
                _, _, usec, frames = avi_decode(p)
                return "avi", len(frames), usec, int(
                    sum(int(f.sum()) for f in frames)
                )
        except Exception:
            pass
        return "unknown", 0, len(p), 0

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [one(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m[0] for m in metas],
                    "dim_a": [m[1] for m in metas],
                    "dim_b": [m[2] for m in metas],
                    "content_sum": [m[3] for m in metas],
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        kernel,
        "doc_id bigint, modality string, dim_a bigint, dim_b bigint, "
        "content_sum bigint",
    )


def image_ahash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL perceptual average-hash (aHash) over decoded images — the
    standard cheap image-dedup/near-dup signal: decode the PNG, compare
    every pixel against the image mean, pack the 64 bits (row-major) of
    the 8x8 raster. The mean compare is exact integers (pixel * n_pixels
    > pixel_sum — no float division), and the hash ships as two 32-bit
    halves (ahash_lo = bits 0-31, ahash_hi = bits 32-63, both
    non-negative) so no engine's signed-64 edge can bite. Raises on
    non-PNG payloads and on rasters that are not exactly 8x8 = 64 px
    (strict verification tail, like png_pixel_stats)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            los, his = [], []
            for p in pdf[payload_col]:
                arr = _png.png_decode(bytes(p))
                flat = arr.astype(np.int64).flatten()
                n = flat.size
                if n != 64:  # the documented 8x8 contract — anything else
                    # would silently hash a prefix of the raster
                    raise ValueError(
                        f"image_ahash requires an 8x8 raster (64 px), got {n}"
                    )
                s = int(flat.sum())
                bits = (flat * n > s).astype(np.uint64)
                shifts = np.arange(32, dtype=np.uint64)
                lo = int((bits[:32] << shifts).sum())
                hi = int((bits[32:64] << shifts).sum())
                los.append(lo)
                his.append(hi)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ahash_lo": los, "ahash_hi": his}
            )

    return df.select("doc_id", payload_col).mapInPandas(
        kernel, "doc_id bigint, ahash_lo bigint, ahash_hi bigint"
    )


def ahash_neardup_pairs(
    hashes: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Image NEAR-dup pairs from aHash signatures — the approximate tier
    on top of :func:`image_ahash`'s exact groups: pairs whose 64-bit
    hashes differ in at most ``max_hamming`` bits. EXACT output with a
    provable candidate guarantee: the hash splits into 4 x 16-bit
    chunks, and by pigeonhole any pair at Hamming <= 3 shares at least
    one intact chunk — so the (chunk_idx, value) equi-join has recall 1
    for the emitted radius, and the bit_count verify removes every
    false positive. All JVM-side integer ops; the shuffle carries
    (doc, 2-byte chunk) rows, never payloads."""
    assert max_hamming <= 3, "4x16-bit banding guarantees recall only to 3"
    lo, hi = F.col("ahash_lo"), F.col("ahash_hi")
    chunks = hashes.select(
        "doc_id",
        "ahash_lo",
        "ahash_hi",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("c"), (lo.bitwiseAND(F.lit(0xFFFF))).alias("v")),
                F.struct(F.lit(1).alias("c"), (F.shiftright(lo, 16).bitwiseAND(F.lit(0xFFFF))).alias("v")),
                F.struct(F.lit(2).alias("c"), (hi.bitwiseAND(F.lit(0xFFFF))).alias("v")),
                F.struct(F.lit(3).alias("c"), (F.shiftright(hi, 16).bitwiseAND(F.lit(0xFFFF))).alias("v")),
            )
        ).alias("cv"),
    ).select("doc_id", "ahash_lo", "ahash_hi", "cv.c", "cv.v").transform(lineage_checkpoint)  # both self-join sides read this; without it the upstream decode
    # chain (payload gen + PNG decode) would execute once per side
    a = chunks.toDF("id_a", "lo_a", "hi_a", "c", "v")
    b = chunks.toDF("id_b", "lo_b", "hi_b", "c", "v")
    cand = (
        a.join(b, ["c", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "lo_a", "hi_a", "lo_b", "hi_b")
        .distinct()
    )
    hamming = (
        F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
        + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    ).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def png_patchify(
    df: DataFrame, payload_col: str = "payload", patch: int = 4
) -> DataFrame:
    """ViT-style PATCH EXTRACTION over REAL decoded PNGs: decode each
    payload (the genuine inflate/un-filter kernel in operators.png) and
    emit one row per non-overlapping ``patch`` x ``patch`` block with
    its exact pixel sum — the image-side tokenization step of a
    multimodal training pipeline (each patch row is what an embedding
    lookup would consume; m13 counts these tokens, this op MATERIALIZES
    them with their spatial index).

    Arrow-batched mapInPandas, fan-out (h/patch)*(w/patch) rows per
    image — a column-stable explode, so partition counts scale with
    input splits and no state leaves the executor. Because the m6
    payload pixels are pure character arithmetic, an SQL oracle can
    predict every patch sum — a hash match certifies decode + spatial
    windowing bit-exactly."""
    import numpy as np

    p = int(patch)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, prs, pcs, sums = [], [], [], []
            for i, raw in zip(pdf["doc_id"], pdf[payload_col]):
                arr = _png.png_decode(bytes(raw)).astype(np.int64)
                h, w = arr.shape[:2]
                for pr in range(h // p):
                    for pc in range(w // p):
                        blk = arr[
                            pr * p : (pr + 1) * p, pc * p : (pc + 1) * p
                        ]
                        ids.append(i)
                        prs.append(pr)
                        pcs.append(pc)
                        sums.append(int(blk.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "patch_row": prs,
                    "patch_col": pcs,
                    "patch_sum": sums,
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        kernel,
        "doc_id bigint, patch_row int, patch_col int, patch_sum bigint",
    )
