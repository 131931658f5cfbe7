"""Real video kernel tests: the pure stdlib+numpy uncompressed-AVI
codec (RIFF chunk tree, avih/strh/strf headers, bottom-up 24-bit DIB
frames), directly and end-to-end through Spark on payloads generated
from text (the m9/m10 chain)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from airflow_etl_pyspark_inmet_spark.operators.avi import (
    avi_decode,
    avi_encode,
    avi_frame_sums,
    avi_stats,
    is_avi,
    text_to_avi_payload,
)


def _frames(n, h=8, w=8):
    return ((np.arange(n * h * w).reshape(n, h, w) * 7) % 256).astype(np.uint8)


def test_avi_roundtrip():
    fr = _frames(3)
    data = avi_encode(fr, 6)
    assert is_avi(data)
    w, h, usec, out = avi_decode(data)
    assert (w, h, usec, len(out)) == (8, 8, 1_000_000 // 6, 3)
    for got, want in zip(out, fr):
        np.testing.assert_array_equal(got, want)


def test_avi_roundtrip_zero_frames():
    data = avi_encode(np.zeros((0, 8, 8), dtype=np.uint8), 5)
    w, h, usec, out = avi_decode(data)
    assert (w, h, usec, out) == (8, 8, 200_000, [])


def test_avi_roundtrip_padded_stride():
    # width 5 -> row stride 15 pads to 16: exercises the 4-byte DIB
    # alignment path on both sides.
    fr = _frames(2, h=3, w=5)
    w, h, usec, out = avi_decode(avi_encode(fr, 8))
    assert (w, h) == (5, 3)
    for got, want in zip(out, fr):
        np.testing.assert_array_equal(got, want)


def test_avi_decode_rejects_malformed():
    data = avi_encode(_frames(1), 5)
    with pytest.raises(ValueError):
        avi_decode(b"JUNK" + data[4:])
    # truncate mid-movi: the RIFF size then overruns the buffer
    with pytest.raises(ValueError):
        avi_decode(data[:-50])
    # corrupt a chunk size so it overruns its parent
    bad = bytearray(data)
    pos = data.index(b"00db")
    struct.pack_into("<I", bad, pos + 4, 10_000_000)
    with pytest.raises(ValueError):
        avi_decode(bytes(bad))


def test_avi_stats_end_to_end(spark):
    rows = [(0, "AB"), (1, ""), (3, "x" * 300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        r["doc_id"]: r for r in avi_stats(text_to_avi_payload(df)).collect()
    }
    assert stats[0]["n_frames"] == 1
    assert stats[0]["usec_per_frame"] == 200_000  # 5 fps
    assert stats[0]["pixel_sum"] == 65 + 66
    assert stats[1]["n_frames"] == 0
    assert stats[1]["pixel_sum"] == 0
    # 300 chars cap to 256 -> 4 full frames at 8 fps (5 + 3 % 4)
    assert stats[3]["n_frames"] == 4
    assert stats[3]["usec_per_frame"] == 125_000
    assert stats[3]["pixel_sum"] == 256 * ord("x")


def test_avi_frame_sums_end_to_end(spark):
    df = spark.createDataFrame(
        [(2, "a" * 64 + "b" * 10)], "doc_id long, text string"
    )
    out = (
        avi_frame_sums(text_to_avi_payload(df)).orderBy("frame_idx").collect()
    )
    assert [(r["frame_idx"], r["frame_sum"]) for r in out] == [
        (0, 64 * ord("a")),
        (1, 10 * ord("b")),
    ]
