"""Streaming layer — FromChannel parity on Structured Streaming.

Reference FromChannel (pipeline/pipeline.go:131-149) is an unbounded
arrival-order feed with no time semantics; the pipeline ends when the
channel closes, Interrupt stops it, Status tracks lifecycle. Mapping
(SURVEY.md §3.3):

- the feed      → spark.readStream source (rate/socket/kafka/file)
- Start         → StreamingQuery via writeStream.start() (manual start
                  is inherent: nothing flows until start())
- Interrupt     → query.stop()
- Status        → Pending (not started) / Running / Done (availableNow
                  drained) / Interrupted
- channel close → Trigger.AvailableNow for bounded feeds

Beyond-reference capability exposed natively: watermarks + tumbling /
sliding / session event-time windows with late-data handling — at
100 TB stream scale these are the operators that matter, and they come
from Structured Streaming for free (stateful agg with RocksDB-style
state store on real clusters).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from pippin_spark.errors import PippinError
from pippin_spark.statuses import Status


class StreamingPipeline:
    """Driver-side handle mirroring Pipeline control for streams."""

    def __init__(self, df: DataFrame) -> None:
        if not df.isStreaming:
            raise PippinError("StreamingPipeline needs a streaming DataFrame")
        self.df = df
        self.query: Optional[StreamingQuery] = None
        self._interrupted = False

    # -- transformations are plain DataFrame ops on .df ----------------
    def with_watermark(self, ts_col: str, delay: str) -> "StreamingPipeline":
        return StreamingPipeline(self.df.withWatermark(ts_col, delay))

    def tumbling_window(
        self, ts_col: str, width: str, *aggs: Column, keys: tuple = ()
    ) -> "StreamingPipeline":
        g = self.df.groupBy(F.window(ts_col, width), *keys)
        return StreamingPipeline(g.agg(*aggs))

    def sliding_window(
        self, ts_col: str, width: str, slide: str, *aggs: Column, keys: tuple = ()
    ) -> "StreamingPipeline":
        g = self.df.groupBy(F.window(ts_col, width, slide), *keys)
        return StreamingPipeline(g.agg(*aggs))

    def session_window(
        self, ts_col: str, gap: str, *aggs: Column, keys: tuple = ()
    ) -> "StreamingPipeline":
        g = self.df.groupBy(F.session_window(ts_col, gap), *keys)
        return StreamingPipeline(g.agg(*aggs))

    # -- control (Start/Interrupt/Status parity) -----------------------
    def start(
        self,
        sink_format: str = "memory",
        query_name: str = "pippin_stream",
        output_mode: str = "update",
        available_now: bool = False,
        state_partitions: Optional[int] = None,
        **options,
    ) -> StreamingQuery:
        """Pipeline.Start analog — nothing flows before this (the
        reference needed ManualStart machinery; streaming is lazy by
        construction). available_now=True gives bounded 'channel
        closed' semantics.

        ``state_partitions`` sizes the stateful-operator shuffle (the
        number of state-store instances), pinned into the query's
        offset log at start. Size it to per-batch volume: each state
        partition costs a store instance (open/commit per batch), so a
        small bounded feed wants few; a 1000-executor cluster ingesting
        a firehose wants the cluster default. None = session setting."""
        session = self.df.sparkSession
        key = "spark.sql.shuffle.partitions"
        prev = session.conf.get(key)
        if state_partitions is not None:
            session.conf.set(key, str(state_partitions))
        try:
            writer = (
                self.df.writeStream.format(sink_format)
                .queryName(query_name)
                .outputMode(output_mode)
                .options(**options)
            )
            if available_now:
                writer = writer.trigger(availableNow=True)
            self.query = writer.start()
            return self.query
        finally:
            # the conf is captured into the query at start(); restoring
            # immediately cannot affect the running stream
            if state_partitions is not None:
                session.conf.set(key, prev)

    def interrupt(self) -> None:
        """Pipeline.Interrupt analog (graceful stop)."""
        self._interrupted = True
        if self.query is not None:
            self.query.stop()

    def await_termination(self, timeout: Optional[float] = None) -> bool:
        if self.query is None:
            raise PippinError("stream not started")
        return self.query.awaitTermination(timeout)

    @property
    def status(self) -> Status:
        if self.query is None:
            return Status.PENDING
        if self._interrupted:
            return Status.INTERRUPTED
        if self.query.isActive:
            return Status.RUNNING
        return Status.DONE


def stateful_running_agg(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    timeout_conf: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful per-key streaming aggregation via
    applyInPandasWithState: maintains (count, sum, max) per key across
    micro-batches and emits the updated state each batch — the escape
    hatch for operators Structured Streaming's built-in aggs can't
    express (reference parity: an async fold with mutable accumulator,
    asyncaggregate/asyncaggregate.go:587-623, but keyed and distributed).

    Scale: state lives in the executor state store (RocksDB on a real
    cluster), partitioned by key — no driver state; each micro-batch
    shuffles only that batch's rows."""
    from pyspark.sql.streaming.state import GroupState

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("maxv", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("maxv", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as _pd

        n, total, maxv = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            vals = pdf["__v__"]
            n += int(vals.count())
            total += float(vals.sum())
            if len(vals):
                maxv = max(maxv, float(vals.max()))
        state.update((n, total, maxv))
        yield _pd.DataFrame(
            {"key": [key[0]], "n": [n], "total": [total], "maxv": [maxv]}
        )

    return (
        stream_df.select(F.col(key_col).alias("__k__"), F.col(value_col).alias("__v__"))
        .groupBy("__k__")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", timeout_conf
        )
    )


def tws_running_agg(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """``stateful_running_agg``'s twin on Spark 4's
    ``transformWithStateInPandas`` (the successor API): state is a
    named ValueState in the executor state store instead of the single
    opaque GroupState tuple, timers/list/map state are available, and
    state schema can evolve between runs. Same (count, sum, max)
    semantics over pre-scaled longs; emits the updated state per key
    per micro-batch.

    Scale: identical to applyInPandasWithState — keyed state store
    partitions, no driver state, per-batch shuffle of that batch only.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.LongType()),
            T.StructField("maxv", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.LongType()),
            T.StructField("maxv", T.LongType()),
        ]
    )

    class _RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            if self._agg.exists():
                n, total, maxv = self._agg.get()
            else:
                n, total, maxv = 0, 0, None
            for pdf in rows:
                # dropna BEFORE int conversion: pandas renders nullable
                # longs as float64 NaN, and int(NaN) raises
                vals = pdf["__v__"].dropna()
                n += int(vals.count())
                if len(vals):
                    total += int(vals.sum())
                    m = int(vals.max())
                    maxv = m if maxv is None else max(maxv, m)
            self._agg.update((n, total, maxv))
            yield _pd.DataFrame(
                {"key": [key[0]], "n": [n], "total": [total], "maxv": [maxv]}
            )

        def close(self) -> None:
            pass

    return (
        stream_df.select(F.col(key_col).alias("__k__"), F.col(value_col).alias("__v__"))
        .groupBy("__k__")
        .transformWithStateInPandas(
            statefulProcessor=_RunningAgg(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
