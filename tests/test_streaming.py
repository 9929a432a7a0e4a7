"""Streaming-vs-batch-twin equivalence (SURVEY §5.4): each live
Structured Streaming form must produce exactly its declared batch
twin's result on the static events fixture."""

from __future__ import annotations

import pandas as pd

from glonassdatamining_spark import registry
from glonassdatamining_spark.streaming import live
from tests.conftest import SF_DIR, compare_frames


def _twin(spark, name: str) -> pd.DataFrame:
    return registry.get(name).builder(spark, SF_DIR).toPandas()


def test_l1_stream_equals_batch(spark):
    got = live.l1_streaming(spark, SF_DIR).toPandas()
    want = _twin(spark, "l1_tumbling_window")
    compare_frames(got, want, "l1_stream_vs_batch")


def test_l3_stream_equals_batch(spark):
    got = live.l3_streaming(spark, SF_DIR).toPandas()
    want = _twin(spark, "l3_session_window")
    compare_frames(got, want, "l3_stream_vs_batch")


def test_l5_stream_covers_keys(spark):
    got = live.l5_streaming(spark, SF_DIR).toPandas()
    want = _twin(spark, "l5_stateful_dedup")
    # dropDuplicates keeps an arbitrary row per key — compare key sets.
    assert sorted(map(tuple, got[["user_id", "event_type"]].values.tolist())) == sorted(
        map(tuple, want[["user_id", "event_type"]].values.tolist())
    )


def test_l6_stream_equals_batch(spark):
    got = live.l6_streaming(spark, SF_DIR).toPandas()
    agg = got.groupby("severity", as_index=False).agg(n=("event_id", "count"))
    want = _twin(spark, "l6_stream_static_join")[["severity", "n"]]
    compare_frames(agg, want.astype({"n": "int64"}), "l6_stream_vs_batch")


def test_l7_stateful_running_final_state(spark):
    got = live.l7_streaming(spark, SF_DIR).toPandas()
    # One availableNow drain → one batch → final state per user equals
    # the batch twin's last running row per user.
    twin = _twin(spark, "l7_stateful_running")
    want = (
        twin.sort_values(["user_id", "events_so_far"])
        .groupby("user_id", as_index=False)
        .last()[["user_id", "events_so_far"]]
        .rename(columns={"events_so_far": "n_events"})
    )
    got_n = got[["user_id", "n_events"]].sort_values("user_id").reset_index(drop=True)
    want = want.sort_values("user_id").reset_index(drop=True)
    assert got_n["user_id"].tolist() == want["user_id"].tolist()
    assert got_n["n_events"].tolist() == want["n_events"].tolist()
