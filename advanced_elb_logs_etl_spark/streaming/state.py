"""Custom stateful streaming operators on the Spark 4 transformWithState
API (the arbitrary-state successor to applyInPandasWithState — typed
per-key state handles, timers, RocksDB-backed).

First operator: streaming run-length dedup ("debounce") — emit only the
first event of each consecutive run of identical values per key, the
streaming twin of the batch run-length collapse in
plans/catalog_r3.q_sequential_dedup_runs. A device double-firing, a bot
hammering one endpoint, or a sensor repeating an unchanged reading
collapses to one emitted row per run.

Semantics note (inherent to streaming): "consecutive" is judged in event-
time order WITHIN each micro-batch (rows are sorted before the walk) and
by the carried last-seen value ACROSS batches; an out-of-order event
arriving in a later batch than its successor is compared against the
newest value seen, not its event-time neighbor. Batch remains the ground
truth for exact run statistics; tests pin single-batch equivalence.

Requires the RocksDB state store provider (transformWithState's backing
store): set spark.sql.streaming.stateStore.providerClass to
...state.RocksDBStateStoreProvider (rocksdb_confs() below). ALSO requires
the `protobuf` Python package (the transformWithState driver worker speaks
protobuf to the JVM; pip-installable everywhere, absent in this build
sandbox) — tests/test_streaming_state.py runs the processor logic
hermetically and skips the live-query integration when protobuf is
missing; applyInPandasWithState (streaming/sessions.py) is the fully
tested custom-state path here.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_confs() -> dict[str, str]:
    """Session confs transformWithState needs; apply before starting the
    query (spark.conf.set per entry)."""
    return {"spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER}


class _DebounceProcessor(StatefulProcessor):
    """Per-key ValueState holding the last emitted value; a micro-batch's
    rows are sorted by (ts, tiebreak) and walked once, Arrow-batched."""

    def __init__(self, ts: str, tiebreak: str, value_col: str, out_fields: list[str]):
        self._ts = ts
        self._tiebreak = tiebreak
        self._value_col = value_col
        self._out_fields = out_fields

    def init(self, handle: StatefulProcessorHandle) -> None:
        # (is_null, v) struct: a stored NULL last-value must be
        # distinguishable from no-state, or a null run ending one
        # micro-batch would be re-emitted in the next (and a null could
        # never debounce a following null).
        self._last = handle.getValueState(
            "last_value",
            StructType(
                [StructField("is_null", BooleanType()), StructField("v", StringType())]
            ),
        )

    def handleInputRows(self, key, rows, timer_values) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values([self._ts, self._tiebreak], kind="mergesort")
        if self._last.exists():
            stored = self._last.get()
            last = (bool(stored[0]), stored[1] or "")
        else:
            last = None  # genuinely no state — first row always emits
        keep = []
        for i, v in enumerate(pdf[self._value_col]):
            cur = (True, "") if pd.isna(v) else (False, v)
            if cur != last:
                keep.append(i)
                last = cur
        if last is not None:
            self._last.update(last)
        yield pdf.iloc[keep][self._out_fields]

    def close(self) -> None:
        pass


def debounce_stream(
    events: DataFrame,
    key: str = "client_ip",
    ts: str = "time",
    value_col: str = "event_type",
    tiebreak: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep only the first event of each consecutive same-value run per key.

    Output schema: (key, ts, value_col, tiebreak) for the kept rows.

    Scale: state per key is ONE string (the last value) in RocksDB — bounded
    regardless of stream length; each micro-batch does one hash exchange on
    the key then an Arrow-batched per-key walk. Contrast the batch form
    (catalog_r3.q_sequential_dedup_runs), which gets exact global run
    statistics from a window sort."""
    out_schema = StructType(
        [
            events.schema[key],
            events.schema[ts],
            events.schema[value_col],
            events.schema[tiebreak],
        ]
    )
    out_fields = [key, ts, value_col, tiebreak]
    return (
        events.withWatermark(ts, watermark)
        .groupBy(key)
        .transformWithStateInPandas(
            statefulProcessor=_DebounceProcessor(ts, tiebreak, value_col, out_fields),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="None",
        )
    )


class _SpaceSavingProcessor(StatefulProcessor):
    """Per-key Space-Saving heavy-hitter sketch (Metwally et al.): a
    bounded table of `capacity` (item, count, err) counters in ValueState.

    Update rule per incoming item: tracked -> increment; table not full ->
    insert (item, 1, 0); else evict the MIN counter and adopt its count as
    the new item's error floor (count = min+1, err = min). Guarantees:
    true_count <= est_count <= true_count + err, and any item with true
    frequency > n/capacity is ALWAYS in the table — the streaming
    counterpart of operators/sketches.exact_heavy_hitters (which is exact
    but needs a second pass).

    State is three parallel arrays in ONE ValueState struct — bounded at
    `capacity` entries per key regardless of stream length."""

    def __init__(self, item_col: str, capacity: int, topk: int):
        self._item_col = item_col
        self._capacity = capacity
        self._topk = topk

    def init(self, handle: StatefulProcessorHandle) -> None:
        from pyspark.sql.types import ArrayType, LongType

        self._table = handle.getValueState(
            "ss_table",
            StructType(
                [
                    StructField("items", ArrayType(StringType())),
                    StructField("counts", ArrayType(LongType())),
                    StructField("errs", ArrayType(LongType())),
                ]
            ),
        )

    def handleInputRows(self, key, rows, timer_values) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if self._table.exists():
            items, counts, errs = (list(x) for x in self._table.get())
        else:
            items, counts, errs = [], [], []
        idx = {it: i for i, it in enumerate(items)}
        for batch in rows:
            for v in batch[self._item_col]:
                it = "" if pd.isna(v) else str(v)
                i = idx.get(it)
                if i is not None:
                    counts[i] += 1
                elif len(items) < self._capacity:
                    idx[it] = len(items)
                    items.append(it)
                    counts.append(1)
                    errs.append(0)
                else:
                    m = min(range(len(counts)), key=lambda j: (counts[j], items[j]))
                    del idx[items[m]]
                    idx[it] = m
                    items[m] = it
                    errs[m] = counts[m]
                    counts[m] += 1
        self._table.update((items, counts, errs))
        order = sorted(
            range(len(items)), key=lambda i: (-counts[i], items[i])
        )[: self._topk]
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(order),
                "item": [items[i] for i in order],
                "est_count": [counts[i] for i in order],
                "max_err": [errs[i] for i in order],
            }
        )

    def close(self) -> None:
        pass


def topk_stream(
    events: DataFrame,
    key: str = "event_type",
    item_col: str = "user_id",
    capacity: int = 64,
    topk: int = 10,
) -> DataFrame:
    """Streaming heavy hitters per key: each micro-batch updates the
    per-key Space-Saving table and emits the current top-k estimates
    (item, est_count, max_err).

    Scale: state is O(capacity) per key in RocksDB — bounded forever; one
    hash exchange per micro-batch. Estimates obey
    true <= est <= true + max_err; exact whenever the key's distinct item
    count stays within capacity."""
    from pyspark.sql.types import LongType

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("item", StringType()),
            StructField("est_count", LongType()),
            StructField("max_err", LongType()),
        ]
    )
    return (
        events.groupBy(key)
        .transformWithStateInPandas(
            statefulProcessor=_SpaceSavingProcessor(item_col, capacity, topk),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
