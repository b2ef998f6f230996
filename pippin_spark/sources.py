"""Custom Python data sources (Spark 4 DataSource API).

The reference's source surface is FromSlice / FromMap / FromChannel
(pipeline/pipeline.go:101-149) — in-process generators feeding the
pipeline. The Spark-4 Python DataSource API is the idiomatic analog
for a source that is neither a file format nor a catalog table: the
driver plans InputPartitions, each executor materializes its own
partition independently, and the result is a normal DataFrame that
every downstream operator (pushdown aside) treats like any other
scan. Registration is per-session: ``spark.dataSource.register``.

``SyntheticDocsDataSource`` is fully deterministic (value = a Knuth
multiplicative hash of the row id), so its output carries an exact
value oracle — the generator can be replayed in ANSI SQL over
``range(n)``. Partition count is an option: the same corpus arrives
identically whether planned as 1 split or 10,000, which is the
property a cluster-scale custom source must hold.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = max(1, int(options.get("parts", 8)))

    def partitions(self):
        if self.n <= 0:
            return [_RangePartition(0, 0)]  # empty source, one no-op split
        step = -(-self.n // self.parts)  # ceil
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, f"lang_{i % 5}", (i * 2654435761) % 4294967296)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pippin_synth"

    def schema(self) -> str:
        return "doc_id bigint, lang string, score bigint"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)
