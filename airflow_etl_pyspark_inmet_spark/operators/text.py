"""Text-analysis operators for a large-scale training-data pipeline:
tokenization stats, quality scoring, language-ID heuristic, document
fingerprinting. All pure `pyspark.sql.functions` compositions — JVM-side,
codegen'd, linear per-row work, no shuffles — so they scale to any corpus
by partition parallelism alone.

Regex patterns are kept to the RE2-compatible subset so the same pattern
is usable in a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Token pattern, BPE-ish: word pieces, digit runs, or single non-space symbols.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

# tiny marker-word inventories for the language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "a"],
    "es": ["el", "la", "de", "que"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
}


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish token count + char count."""
    t = F.col(text_col)
    return df.select(
        *df.columns,
        F.size(F.split(F.trim(t), "\\s+")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), 0))
        .cast("bigint")
        .alias("bpe_tokens"),
        F.length(t).cast("bigint").alias("chars"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: length, alpha ratio, punctuation ratio,
    stopword ratio, mean word length — the standard cheap pre-filters of a
    training-data pipeline. Ratios are deterministic IEEE divisions of
    exact integer counts, so they oracle-compare exactly."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    n_alpha = (n_chars - F.length(F.regexp_replace(t, "[a-zA-Z]", ""))).cast("double")
    n_punct = (n_chars - F.length(F.regexp_replace(t, "[.,;:!?]", ""))).cast("double")
    words = F.split(F.trim(t), "\\s+")
    n_words = F.size(words).cast("double")
    stop = F.lit(["the", "a", "and", "of", "to", "in", "is"])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop, F.lower(w)))).cast(
        "double"
    )
    return df.select(
        *df.columns,
        n_chars.cast("bigint").alias("n_chars_calc"),
        (n_alpha / n_chars).alias("alpha_ratio"),
        (n_punct / n_chars).alias("punct_ratio"),
        (n_stop / n_words).alias("stopword_ratio"),
        ((n_chars - n_words + 1) / n_words).alias("mean_word_len"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic: count marker hits per language,
    argmax with fixed precedence order (en > es > de > fr > unknown).

    A real pipeline swaps in fastText/CLD3 behind the same column contract;
    the plumbing (pure column expr, no shuffle) is the point here.
    """
    words = F.split(F.lower(F.col(text_col)), "\\s+")
    scores = {
        lang: F.size(F.filter(words, lambda w: F.array_contains(F.lit(ms), w)))
        for lang, ms in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("unknown"))
    for lang in ["en", "es", "de", "fr"]:  # fixed precedence for ties
        pred = pred.when(scores[lang] == best, F.lit(lang))
    out = df.select(
        *df.columns,
        *[scores[lang].cast("bigint").alias(f"score_{lang}") for lang in scores],
        pred.alias("lang_pred"),
    )
    return out


def word_ngrams(text: Column, n: int) -> Column:
    """Array of word n-gram shingles (space-joined), JVM-side via
    transform+sequence with bracket indexing (0-based array access is
    ~7x faster than an element_at chain in codegen)."""
    words = F.split(F.trim(text), "\\s+")
    k = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(-1)))
    joined = F.transform(idx, lambda i: _gram_at(words, i, n))
    return F.when(k >= n, joined).otherwise(F.array().cast("array<string>"))


def _gram_at(words: Column, i: Column, n: int) -> Column:
    parts: list[Column] = []
    for j in range(n):
        if j:
            parts.append(F.lit(" "))
        parts.append(words[(i + j).cast("int")])
    return F.concat(*parts)


def exploded_ngrams(
    df, id_col: str, text_col: str, n: int
):
    """(id, g) rows of word n-grams — the shared fast path for dedup and
    fingerprinting: split once into a materialized array column, bracket-
    indexed gram assembly, parallelism ensured for small-file scans."""
    from .util import ensure_parallelism

    d = ensure_parallelism(df.select(F.col(id_col).alias("_id"), F.col(text_col)))
    d = d.select("_id", F.split(F.trim(F.col(text_col)), "\\s+").alias("_ws"))
    ws = F.col("_ws")
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(-1)))
    grams = F.transform(idx, lambda i: _gram_at(ws, i, n))
    return d.select(
        "_id",
        F.explode(
            F.when(F.size(ws) >= n, grams).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                ngram: int = 3) -> DataFrame:
    """Content fingerprint: lexicographic min/max of md5(word-ngram) plus
    ngram count — a winnowing-style rolling-hash signature. md5 is
    identical across engines, so this is oracle-checkable; at scale the
    min/max reduce is a cheap partial aggregate."""
    e = exploded_ngrams(df, id_col, text_col, ngram)
    return e.groupBy("_id").agg(
        F.min(F.md5(F.col("g"))).alias("fp_min"),
        F.max(F.md5(F.col("g"))).alias("fp_max"),
        F.count(F.lit(1)).alias("n_grams"),
    ).withColumnRenamed("_id", id_col)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window preprocessing step of an LLM training/RAG pipeline.
    Pure JVM array ops (split -> sequence of starts -> posexplode ->
    slice -> array_join): per-row fan-out with no UDF and no shuffle;
    chunking 100 TB is a map-only stage."""
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(ws)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    out = df.select(
        F.col(id_col),
        ws.alias("_ws"),
        n.alias("_n"),
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_start"))
        .cast("int")
        .alias("n_tokens"),
        F.array_join(
            F.slice(F.col("_ws"), F.col("_start") + 1, F.lit(chunk_tokens)), " "
        ).alias("chunk_text"),
    )


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonical text normalization ahead of dedup/fingerprinting: lower,
    strip non-alphanumerics, collapse whitespace. Doing this BEFORE
    shingling makes near-dup detection robust to case/punctuation noise;
    all JVM regexp ops, map-only."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    return df.select(F.col(id_col), cleaned.alias("norm_text"))
