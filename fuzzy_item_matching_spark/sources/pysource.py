"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`) — the
engine-native way to wrap an external system (an internal API, a
proprietary format, a synthetic generator) as a first-class PARALLEL
scan: the driver plans N input partitions, each task pulls only its
partition's rows, and results flow back as Arrow batches.

The source here is a deterministic congruential generator (so the
scan is exactly SQL-replicable — the point is the connector plumbing,
not the data): ``n_parts`` partitions x ``rows_per_part`` rows of
(part_id, seq, value) with value = (part_id * 1_000_003 + seq * 97)
% 1_000_000_007.

At 100 TB the same shape is how a crawl frontier, a Kafka snapshot,
or an object-store listing becomes a DataFrame without a collect: the
partition planner is metadata-only on the driver, every read() runs
executor-side, and Spark handles retry/locality per partition.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Part(InputPartition):
    def __init__(self, part_id: int, rows: int) -> None:
        self.part_id = part_id
        self.rows = rows


class SyntheticSeqReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_parts = int(options.get("n_parts", 8))
        self.rows_per_part = int(options.get("rows_per_part", 1000))

    def partitions(self) -> list[_Part]:
        return [_Part(i, self.rows_per_part) for i in range(self.n_parts)]

    def read(self, partition: _Part):
        pid = partition.part_id
        for seq in range(partition.rows):
            yield (pid, seq, (pid * 1_000_003 + seq * 97) % 1_000_000_007)


class SyntheticSeqDataSource(DataSource):
    """``spark.read.format("synthetic_seq")`` after
    ``spark.dataSource.register(SyntheticSeqDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_seq"

    def schema(self) -> str:
        return "part_id int, seq int, value bigint"

    def reader(self, schema) -> SyntheticSeqReader:
        return SyntheticSeqReader(self.options)


# ---- streaming variant -------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class SyntheticSeqStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched twin of SyntheticSeqReader: offsets are row
    positions in the same congruential sequence, so every batch — and
    any replay between two committed offsets — is deterministic.
    ``read`` serves ``batch_rows`` per trigger until ``total_rows`` is
    exhausted, then reports an unchanged offset (-> availableNow
    drains and terminates)."""

    def __init__(self, options: dict) -> None:
        self.total_rows = int(options.get("total_rows", 300))
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    @staticmethod
    def _row(i: int) -> tuple:
        return (i, (i * 97 + 11) % 1_000_000_007)

    def read(self, start: dict):
        s = int(start["pos"])
        e = min(s + self.batch_rows, self.total_rows)
        return iter([self._row(i) for i in range(s, e)]), {"pos": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [self._row(i) for i in range(int(start["pos"]), int(end["pos"]))]
        )


class SyntheticSeqStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_seq_stream"

    def schema(self) -> str:
        return "seq int, value bigint"

    def simpleStreamReader(self, schema) -> SyntheticSeqStreamReader:
        return SyntheticSeqStreamReader(self.options)
