"""Sessionize tie-stability (r03 verdict item 7).

The sessionize oracles order events by (ts, event_id); these tests pin
that the engine's session assignment is stable for duplicate
(user_id, ts) rows — identical output for every input row order — and
that the gap boundary is strict (> gap starts a session, == gap does
not), so the oracle-gated queries cannot flake on ordering.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_spark.streaming.events import sessionize

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(spark, rows, order):
    """events df (user_id, ts, event_id) in a chosen row order."""
    return spark.createDataFrame(
        [rows[i] for i in order],
        "user_id long, ts timestamp, event_id long")


def _canon(df):
    return sorted(
        (r.user_id, r.session_id, r.n_events, r.session_start,
         r.session_end)
        for r in df.collect())


@pytest.fixture(scope="module")
def tie_rows():
    """User 1: three events at the SAME timestamp (ids shuffled), a
    fourth 31 min later; user 2 interleaved with exact-gap events."""
    m = dt.timedelta(minutes=1)
    return [
        (1, T0, 3), (1, T0, 1), (1, T0, 2),          # tied triple
        (1, T0 + 31 * m, 5),                          # new session
        (2, T0, 10), (2, T0 + 30 * m, 11),            # == gap: SAME
        (2, T0 + 30 * m + 30 * m, 12),                # == gap again
    ]


def test_tie_rows_are_order_stable(spark, tie_rows):
    n = len(tie_rows)
    orders = [list(range(n)), list(reversed(range(n))),
              [3, 0, 6, 2, 5, 1, 4], [1, 4, 2, 6, 0, 3, 5]]
    outs = [_canon(sessionize(_mk(spark, tie_rows, o))) for o in orders]
    assert all(o == outs[0] for o in outs[1:])


def test_tied_events_share_one_session(spark, tie_rows):
    out = {(r.user_id, r.session_id): r.n_events
           for r in sessionize(_mk(spark, tie_rows,
                                   range(len(tie_rows)))).collect()}
    # user 1: the tied triple is one session, the +31 min event another
    assert out[(1, 1)] == 3 and out[(1, 2)] == 1
    # user 2: exact-gap chain stays ONE session (strict > semantics,
    # mirroring the oracle's `ts - lag(ts) > INTERVAL 30 MINUTE`)
    assert out[(2, 1)] == 3 and (2, 2) not in out


def test_stream_sessionize_matches_batch_on_ties(spark, tie_rows,
                                                 tmp_path):
    """The stateful streaming operator folds each batch in
    (ts, event_id) order — same tie rule as batch, same output."""
    import uuid

    from incubator_hugegraph_spark.streaming.events import (
        run_stream_sessionize)
    path = str(tmp_path / "tied_events")
    df = _mk(spark, tie_rows, [3, 0, 6, 2, 5, 1, 4]) \
        .withColumn("event_type", F.lit("x")) \
        .withColumn("value", F.lit(0.0))
    df.coalesce(1).write.parquet(path)
    got = run_stream_sessionize(
        spark, path, name="tie_" + uuid.uuid4().hex[:8])
    want = sessionize(_mk(spark, tie_rows, range(len(tie_rows))))
    assert _canon(got) == _canon(want)
