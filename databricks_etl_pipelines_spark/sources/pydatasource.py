"""Custom batch data source on Spark 4's Python DataSource API.

The reference consumes only built-in sources (rate, Delta — SURVEY §2.1);
real pipelines routinely need a custom connector (crawl frontier, internal
feed, synthetic load). ``pyspark.sql.datasource`` is the public Spark 4
surface for writing one in pure Python: the reader declares
``partitions()`` (one InputPartition per parallel split — THIS is what
makes the source scale: a 1000-executor cluster reads 1000 splits
concurrently) and a per-partition ``read()`` generator that runs
executor-side.

Everything generated here is a pure function of (doc_id, seed) through
the same md5 rolling-hash used by the curation samplers, so a DuckDB
oracle can regenerate the EXACT rows in SQL — giving a custom Python
data source a full value-hash differential check, not just a row count.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

VOCAB = (
    "alpha", "bravo", "charlie", "delta",
    "echo", "foxtrot", "golf", "hotel",
)

_MOD = 2147483647


def _fold(s: str) -> int:
    """Karp-Rabin fold over md5 hex — byte-identical to
    ``functions.textfns.fingerprint_rolling`` (Spark) and the
    ``list_reduce`` form the DuckDB oracles use."""
    import hashlib

    h = 0
    for ch in hashlib.md5(s.encode()).hexdigest():
        h = (h * 257 + ord(ch)) % _MOD
    return h


def doc_text(doc_id: int) -> str:
    n_words = 5 + _fold(f"{doc_id}:len") % 8
    return " ".join(
        VOCAB[_fold(f"{doc_id}:{j}") % len(VOCAB)] for j in range(n_words)
    )


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("rows", N)`` — a
    deterministic document feed. Options: rows (total), n_partitions
    (parallel splits)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_words int"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(
            int(self.options.get("rows", 100)),
            int(self.options.get("n_partitions", 4)),
        )


class _Split(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, rows: int, n_partitions: int):
        self.rows, self.n_partitions = rows, n_partitions

    def partitions(self):
        per = -(-self.rows // self.n_partitions)  # ceil
        return [
            _Split(i * per, min((i + 1) * per, self.rows))
            for i in range(self.n_partitions)
            if i * per < self.rows
        ]

    def read(self, partition: _Split):
        # executor-side: each split generates only its own id range
        for i in range(partition.start, partition.end):
            text = doc_text(i)
            yield (i, text, len(text.split(" ")))


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticDocsDataSource)


class SyntheticDocsStreamDataSource(DataSource):
    """Streaming flavor of the same feed: ``spark.readStream.format(
    "synthetic_docs_stream")``. Offsets are plain row positions, so
    checkpointed restarts resume exactly where the last drain stopped —
    exactly-once consumption of a custom Python source."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs_stream"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_words int"

    def simpleStreamReader(self, schema) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(
            int(self.options.get("rows", 100)),
            int(self.options.get("batch", 25)),
        )


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader: each micro-batch serves the next
    ``batch`` ids; the offset is just the next unread position."""

    def __init__(self, rows: int, batch: int):
        self.rows, self.batch = rows, batch

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        i = int(start["i"])
        if i >= self.rows:
            return iter([]), {"i": i}
        end = min(i + self.batch, self.rows)
        rows = [
            (j, doc_text(j), len(doc_text(j).split(" ")))
            for j in range(i, end)
        ]
        return iter(rows), {"i": end}

    def readBetweenOffsets(self, start, end):
        # replay for recovery: regenerate the exact range deterministically
        return iter(
            (j, doc_text(j), len(doc_text(j).split(" ")))
            for j in range(int(start["i"]), int(end["i"]))
        )

    def commit(self, end):
        pass


def register_stream(spark) -> None:
    spark.dataSource.register(SyntheticDocsStreamDataSource)


class JsonlSinkDataSource(DataSource):
    """Custom WRITE path of the Python DataSource API: a JSON-lines sink
    with a two-phase commit. Each task writes its partition to a ``.tmp``
    file and returns a WriterCommitMessage; only the driver-side
    ``commit()`` renames every tmp into place (``abort()`` deletes them).
    A failed/retried task therefore never publishes partial output — the
    same task-commit protocol file sinks use for exactly-once writes.

    ``df.write.format("jsonl_sink").option("path", dir).mode("append")``.
    """

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(self.options["path"])


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path, self.n_rows = path, n_rows


class JsonlWriter(DataSourceWriter):
    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def write(self, iterator) -> _JsonlCommit:
        import json
        import os
        import uuid

        os.makedirs(self.out_dir, exist_ok=True)
        tmp = os.path.join(
            self.out_dir, f"part-{uuid.uuid4().hex}.jsonl.tmp"
        )
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages) -> None:
        import os

        for m in messages:
            os.rename(m.path, m.path[: -len(".tmp")])

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if os.path.exists(m.path):
                os.remove(m.path)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
