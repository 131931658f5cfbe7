"""Real audio kernel tests: stdlib WAV/RIFF encode -> parse -> PCM
decode round-trip, both directly and end-to-end through Spark on
payloads generated from text (the m7/m8 chain)."""

from __future__ import annotations

import io
import wave

import numpy as np
from pyspark.sql import functions as F

from airflow_etl_pyspark_inmet_spark.operators.audio import (
    _encode_wav,
    is_wav,
    text_to_wav_payload,
    wav_audio_stats,
    wav_frame_sample,
)


def test_wav_roundtrip_direct():
    samples = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
    data = _encode_wav(samples, 12000)
    assert is_wav(data)
    with wave.open(io.BytesIO(data), "rb") as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 12000
        assert w.getnframes() == len(samples)
        out = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    np.testing.assert_array_equal(out, samples)


def test_wav_roundtrip_empty():
    data = _encode_wav(np.array([], dtype=np.int16), 8000)
    assert is_wav(data)
    with wave.open(io.BytesIO(data), "rb") as w:
        assert w.getnframes() == 0


def test_wav_stats_end_to_end(spark):
    # Known texts: stats and sampled frames are hand-computable.
    rows = [(0, "AB"), (1, ""), (3, "x" * 100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        r["doc_id"]: r
        for r in wav_audio_stats(text_to_wav_payload(df)).collect()
    }
    # doc 0: 2 frames at 8000 Hz; pcm = (65-128)*256 + (66-128)*256
    assert stats[0]["n_frames"] == 2
    assert stats[0]["sample_rate"] == 8000
    assert stats[0]["duration_us"] == 2 * 1_000_000 // 8000
    assert stats[0]["pcm_sum"] == ((65 - 128) + (66 - 128)) * 256
    # doc 1: empty text -> 0 frames, 0 duration, 0 sum
    assert stats[1]["n_frames"] == 0
    assert stats[1]["duration_us"] == 0
    assert stats[1]["pcm_sum"] == 0
    # doc 3: 100 chars capped to 64 frames at 8000+3*4000 Hz
    assert stats[3]["n_frames"] == 64
    assert stats[3]["sample_rate"] == 20000
    assert stats[3]["pcm_sum"] == 64 * (ord("x") - 128) * 256


def test_wav_frame_sample_end_to_end(spark):
    df = spark.createDataFrame([(7, "abcdefghijklmnopqr")], "doc_id long, text string")
    out = (
        wav_frame_sample(text_to_wav_payload(df), every_n=16)
        .orderBy("frame_idx")
        .collect()
    )
    # 18 frames -> sampled at 0 and 16
    assert [(r["frame_idx"], r["sample"]) for r in out] == [
        (0, (ord("a") - 128) * 256),
        (16, (ord("q") - 128) * 256),
    ]


def test_wav_payloads_are_riff(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(20)
    pay = text_to_wav_payload(docs.select("doc_id", "text"))
    bad = pay.filter(
        ~(
            (F.substring("payload", 1, 4) == F.lit(b"RIFF"))
            & (F.substring("payload", 9, 4) == F.lit(b"WAVE"))
        )
    ).count()
    assert bad == 0


def test_wav_energy_windows_roundtrip(spark):
    """Windowed energies equal numpy sums of squares of the encoded
    samples, including the trailing partial window."""
    import numpy as np

    from airflow_etl_pyspark_inmet_spark.operators.audio import (
        text_to_wav_payload,
        wav_energy_windows,
    )

    text = "abcdefghijklmnopqrstu"  # 21 chars -> 21 frames: 16 + 5
    docs = spark.createDataFrame([(3, text)], "doc_id bigint, text string")
    out = wav_energy_windows(text_to_wav_payload(docs), win=16).collect()
    samples = np.array(
        [((ord(c) & 0xFF) - 128) * 256 for c in text], dtype=np.int64
    )
    got = {r["win_idx"]: (r["n_frames"], r["energy"]) for r in out}
    assert got == {
        0: (16, int((samples[:16] ** 2).sum())),
        1: (5, int((samples[16:] ** 2).sum())),
    }


def test_wav_autocorr_roundtrip(spark):
    """Lag products equal numpy's shifted dot, including the
    shorter-than-lag zero row."""
    import numpy as np

    from airflow_etl_pyspark_inmet_spark.operators.audio import (
        text_to_wav_payload,
        wav_autocorr,
    )

    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "xy")], "doc_id bigint, text string"
    )
    out = wav_autocorr(text_to_wav_payload(docs), lags=(1, 4)).collect()
    got = {(r["doc_id"], r["lag"]): (r["n_terms"], r["autocorr"]) for r in out}
    s1 = np.array(
        [((ord(c) & 0xFF) - 128) * 256 for c in "abcdefgh"], dtype=np.int64
    )
    s2 = np.array(
        [((ord(c) & 0xFF) - 128) * 256 for c in "xy"], dtype=np.int64
    )
    assert got == {
        (1, 1): (7, int((s1[:-1] * s1[1:]).sum())),
        (1, 4): (4, int((s1[:-4] * s1[4:]).sum())),
        (2, 1): (1, int((s2[:-1] * s2[1:]).sum())),
        (2, 4): (0, 0),
    }


def test_wav_autocorr_lag_zero_is_energy(spark):
    """lag=0 must return the signal's energy sum(s[i]^2) with
    n_terms=len — the old samples[:-0] slice was empty, silently
    reporting autocorr=0 (r10 advice)."""
    import numpy as np

    from airflow_etl_pyspark_inmet_spark.operators.audio import (
        text_to_wav_payload,
        wav_autocorr,
    )

    docs = spark.createDataFrame([(1, "abcd")], "doc_id bigint, text string")
    out = wav_autocorr(text_to_wav_payload(docs), lags=(0,)).collect()
    s = np.array(
        [((ord(c) & 0xFF) - 128) * 256 for c in "abcd"], dtype=np.int64
    )
    assert len(out) == 1
    r = out[0]
    assert (r["n_terms"], r["autocorr"]) == (4, int((s * s).sum()))
