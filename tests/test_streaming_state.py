"""transformWithState debounce operator.

The processor's run-length logic is tested hermetically (fake state
handle, plain pandas — no Spark streaming involved). The live
transformWithStateInPandas integration needs the `protobuf` package for
Spark's driver-side state worker, which this sandbox lacks — those tests
skip themselves with the reason recorded.
"""

from __future__ import annotations

import importlib.util
import json

import pandas as pd
import pytest

from advanced_elb_logs_etl_spark.streaming.state import (
    _DebounceProcessor,
    debounce_stream,
    rocksdb_confs,
)

try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # parent 'google' namespace absent entirely
    _HAS_PROTOBUF = False

SCHEMA = "client_ip string, time timestamp, event_type string, event_id long"
OUT_FIELDS = ["client_ip", "time", "event_type", "event_id"]


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())


def _proc():
    p = _DebounceProcessor("time", "event_id", "event_type", OUT_FIELDS)
    p.init(_FakeHandle())
    return p


def _pdf(rows):
    return pd.DataFrame(rows, columns=OUT_FIELDS)


def test_processor_collapses_runs_within_batch():
    p = _proc()
    pdf = _pdf([
        ("a", "12:00", "view", 1),
        ("a", "12:01", "view", 2),
        ("a", "12:02", "click", 3),
        ("a", "12:03", "click", 4),
        ("a", "12:04", "view", 5),
    ])
    out = pd.concat(list(p.handleInputRows(("a",), iter([pdf]), None)))
    assert list(out["event_id"]) == [1, 3, 5]


def test_processor_sorts_out_of_order_rows_before_walk():
    p = _proc()
    pdf = _pdf([
        ("a", "12:02", "click", 3),
        ("a", "12:00", "view", 1),
        ("a", "12:01", "view", 2),
    ])
    out = pd.concat(list(p.handleInputRows(("a",), iter([pdf]), None)))
    assert list(out["event_id"]) == [1, 3]


def test_processor_state_carries_across_batches():
    p = _proc()
    b0 = _pdf([("a", "12:00", "view", 1)])
    out0 = pd.concat(list(p.handleInputRows(("a",), iter([b0]), None)))
    assert list(out0["event_id"]) == [1]
    b1 = _pdf([
        ("a", "12:10", "view", 2),   # continues the stored run -> suppressed
        ("a", "12:11", "click", 3),  # changed -> emitted
    ])
    out1 = pd.concat(list(p.handleInputRows(("a",), iter([b1]), None)))
    assert list(out1["event_id"]) == [3]


def test_processor_null_runs_debounce_across_batches():
    """A null last-value is STORED (as a (is_null, v) struct), so a null
    run ending one micro-batch suppresses its continuation in the next —
    and stored-null is distinguishable from no-state."""
    p = _proc()
    b0 = _pdf([
        ("a", "12:00", "view", 1),
        ("a", "12:01", None, 2),   # value change -> emitted
        ("a", "12:02", None, 3),   # same-null run -> suppressed
    ])
    out0 = pd.concat(list(p.handleInputRows(("a",), iter([b0]), None)))
    assert list(out0["event_id"]) == [1, 2]
    b1 = _pdf([
        ("a", "12:10", None, 4),    # continues the stored NULL run -> suppressed
        ("a", "12:11", "view", 5),  # changed -> emitted
    ])
    out1 = pd.concat(list(p.handleInputRows(("a",), iter([b1]), None)))
    assert list(out1["event_id"]) == [5]


def test_processor_first_null_row_emits_with_no_state():
    p = _proc()
    out = pd.concat(
        list(p.handleInputRows(("a",), iter([_pdf([("a", "12:00", None, 1)])]), None))
    )
    assert list(out["event_id"]) == [1]


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState driver worker needs the protobuf package, "
    "absent in this sandbox (streaming/state.py docstring)",
)
def test_debounce_stream_end_to_end(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    rows = [
        {"client_ip": "a", "time": "2025-05-26 12:00:00", "event_type": "view", "event_id": 1},
        {"client_ip": "a", "time": "2025-05-26 12:01:00", "event_type": "view", "event_id": 2},
        {"client_ip": "a", "time": "2025-05-26 12:02:00", "event_type": "click", "event_id": 3},
    ]
    (d / "b0.json").write_text("\n".join(json.dumps(r) for r in rows))
    for k, v in rocksdb_confs().items():
        spark.conf.set(k, v)
    stream = spark.readStream.schema(SCHEMA).json(str(d))
    q = (debounce_stream(stream).writeStream.format("memory")
         .queryName("debounce_e2e").outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    kept = sorted(r["event_id"] for r in spark.sql("SELECT * FROM debounce_e2e").collect())
    assert kept == [1, 3]


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState driver worker needs the protobuf package, "
    "absent in this sandbox (streaming/state.py docstring)",
)
def test_topk_stream_end_to_end(spark, tmp_path):
    """Live-engine pass of the public topk_stream wrapper (the processor
    is pinned hermetically below; this exercises the
    transformWithStateInPandas wiring the day protobuf is present)."""
    from advanced_elb_logs_etl_spark.streaming.state import topk_stream

    d = tmp_path / "in_topk"
    d.mkdir()
    rows = [
        {"client_ip": u, "time": "2025-05-26 12:00:00",
         "event_type": "view", "event_id": i}
        for i, u in enumerate(list("aaab"))
    ]
    (d / "b0.json").write_text("\n".join(json.dumps(r) for r in rows))
    for k, v in rocksdb_confs().items():
        spark.conf.set(k, v)
    stream = spark.readStream.schema(SCHEMA).json(str(d))
    q = (topk_stream(stream, key="event_type", item_col="client_ip",
                     capacity=8, topk=2)
         .writeStream.format("memory").queryName("topk_e2e")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["item"], r["est_count"])
           for r in spark.sql("SELECT * FROM topk_e2e").collect()}
    assert got == {("a", 3), ("b", 1)}  # within capacity -> exact


# ---------------------------------------------------------------------------
# Space-Saving streaming top-k (hermetic, like the debounce tests)
# ---------------------------------------------------------------------------

from advanced_elb_logs_etl_spark.streaming.state import _SpaceSavingProcessor


def _drive_ss(proc, batches):
    """Feed pandas batches through the processor with the fake handle."""
    import pandas as pd

    h = _FakeHandle()
    proc.init(h)
    outs = []
    for b in batches:
        outs.append(
            next(proc.handleInputRows(("k",), iter([pd.DataFrame({"item": b})]), None))
        )
    return outs


def test_space_saving_exact_within_capacity():
    proc = _SpaceSavingProcessor("item", capacity=10, topk=5)
    out = _drive_ss(proc, [["a", "b", "a", "c", "a", "b"]])[-1]
    got = {r.item: (r.est_count, r.max_err) for r in out.itertuples()}
    assert got == {"a": (3, 0), "b": (2, 0), "c": (1, 0)}


def test_space_saving_state_carries_and_bounds_hold():
    import collections
    import random

    rng = random.Random(7)
    stream = [str(rng.choice("abcde")) for _ in range(200)] + ["hh"] * 120
    rng.shuffle(stream)
    batches = [stream[i : i + 40] for i in range(0, len(stream), 40)]
    proc = _SpaceSavingProcessor("item", capacity=4, topk=4)
    out = _drive_ss(proc, batches)[-1]
    true = collections.Counter(stream)
    n = len(stream)
    for r in out.itertuples():
        assert true[r.item] <= r.est_count <= true[r.item] + r.max_err
    # heavy-hitter guarantee: freq > n/capacity must be present
    present = {r.item for r in out.itertuples()}
    for it, c in true.items():
        if c > n / 4:
            assert it in present, (it, c)


def test_space_saving_eviction_inherits_min_count():
    proc = _SpaceSavingProcessor("item", capacity=2, topk=2)
    out = _drive_ss(proc, [["a", "a", "b", "c"]])[-1]
    got = {r.item: (r.est_count, r.max_err) for r in out.itertuples()}
    # c evicted b (min count 1): est = 2 with err floor 1
    assert got["a"] == (2, 0) and got["c"] == (2, 1)
