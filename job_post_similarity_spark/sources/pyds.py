"""Custom Python data source (the PySpark 4 DataSource API): a
deterministic synthetic-documents generator — the pattern for
wrapping ANY Python-reachable system (an internal REST API, a
proprietary format, a queue) as a first-class ``spark.read.format``
source with real partition-parallel reads.

Registration is per-session:

    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("rows", 1000).option("partitions", 8).load())

Scale notes: ``partitions()`` drives read parallelism — each
InputPartition becomes one task, and the generator never touches the
driver; options are the only driver→executor state (picklable,
KB-sized). Determinism: row content is a pure function of doc_id
(LCG-derived token sequence), so retries/speculative tasks reproduce
identical rows — the property file sources get from immutability and
a custom source must supply itself.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
).split()


class _DocsPartition(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index = index
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 100))
        self.n_parts = max(1, int(options.get("partitions", 4)))
        self.doc_tokens = int(options.get("doc_tokens", 8))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _DocsPartition(i, i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition: _DocsPartition):
        for doc_id in range(partition.start, partition.end):
            yield _gen_row(doc_id, self.doc_tokens)


def _gen_row(doc_id: int, doc_tokens: int) -> tuple:
    """One deterministic row — shared by the batch reader and the
    streaming reader so stream == batch over the same id range (the
    oracle-twin property, supplied by construction)."""
    state = doc_id * 2654435761 % (2**31)
    toks = []
    for _ in range(doc_tokens):
        state = (state * 1103515245 + 12345) % (2**31)
        toks.append(_WORDS[state % len(_WORDS)])
    return (doc_id, " ".join(toks))


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same generator (PySpark 4
    SimpleDataSourceStreamReader): offsets are plain dicts checkpointed
    by the engine; ``read`` advances ``rows_per_batch`` ids per
    micro-batch up to ``max_rows``; ``readBetweenOffsets`` replays any
    committed range EXACTLY (rows are a pure function of doc_id) —
    the replayability contract a custom streaming source must supply
    for end-to-end exactly-once."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 10))
        self.max_rows = int(options.get("max_rows", 50))
        self.doc_tokens = int(options.get("doc_tokens", 8))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        s = int(start["next"])
        e = min(s + self.rows_per_batch, self.max_rows)
        rows = [_gen_row(i, self.doc_tokens) for i in range(s, e)]
        return (iter(rows), {"next": e})

    def readBetweenOffsets(self, start, end):
        return iter(
            _gen_row(i, self.doc_tokens)
            for i in range(int(start["next"]), int(end["next"]))
        )


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id long, text string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)
