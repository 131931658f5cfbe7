"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-document generator, the pattern for plugging
any Python-reachable system (internal API, bespoke binary format, message
bus) into Spark as a first-class `spark.read.format(...)` source.

Scale model: `partitions()` declares the split of the read into
independent tasks (here `n_partitions` ranges of doc ids); each executor
calls `read(partition)` for its splits only, so generation/IO
parallelizes across the cluster exactly like a file scan — no driver
bottleneck, no collect. The generator is a pure function of doc_id, so
the source is replayable (same options -> same rows on any cluster
layout), which is what makes it usable under task retries.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = (
    "spark query table join scan filter agg window stream batch sort merge "
    "column value key group order line customer part the a fast big small"
).split()

_LANGS = ("en", "es", "de", "fr")


def _doc_text(doc_id: int, n_words: int = 40) -> str:
    """Pure-function text of a doc id (LCG over a fixed word list)."""
    state = (doc_id * 2654435761 + 12345) & 0x7FFFFFFF
    out = []
    for _ in range(n_words):
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        out.append(_WORDS[state % len(_WORDS)])
    return " ".join(out)


class SyntheticDocsPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self.n_docs // self.n_partitions)
        return [
            SyntheticDocsPartition(i, min(i + step, self.n_docs))
            for i in range(0, self.n_docs, step)
        ]

    def read(self, partition: SyntheticDocsPartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield (
                doc_id,
                _doc_text(doc_id),
                _LANGS[doc_id % len(_LANGS)],
            )


class SyntheticDocsDataSource(DataSource):
    """Register with ``spark.dataSource.register(SyntheticDocsDataSource)``,
    then ``spark.read.format("synthetic_docs").option("n_docs", N).load()``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)
