"""Skew-salting helpers (SURVEY §4.3 salted-key splitting; VERDICT r2 #5).

Each salted operator must produce results IDENTICAL to its unsalted
counterpart on a corpus where one key holds ~50% of all rows — the hot
key's work spreads over num_salts sub-tasks, bounding per-task group size,
but the merged output is the same multiset of rows.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def _skewed_events(n: int = 4000, hot_share: float = 0.5, seed: int = 7):
    """Events table where key 'hot' holds ~hot_share of rows, 20 cold keys
    share the rest. Timestamps are scattered so sessions are non-trivial."""
    rng = np.random.default_rng(seed)
    n_hot = int(n * hot_share)
    keys = ["hot"] * n_hot + [
        f"cold-{i % 20:02d}" for i in range(n - n_hot)
    ]
    t0 = dt.datetime(2024, 3, 1)
    # gaps of 1..120 s: with gap_seconds=30 this yields many sessions
    offs = np.cumsum(rng.integers(1, 121, size=n))
    ts = [t0 + dt.timedelta(seconds=int(o)) for o in offs]
    rng.shuffle(keys)
    score = rng.normal(size=n)
    return pa.table(
        {
            "k": keys,
            "ts": pa.array(ts, pa.timestamp("us")),
            "score": score,
            "rid": np.arange(n, dtype=np.int64),
        }
    )


def _rows_sorted(ds, cols):
    rows = [tuple(r[c] for c in cols) for r in ds.take_all()]
    return sorted(rows)


def test_sample_hot_keys_detects_planted_hot_key(ray_session):
    from crawlray.ops.relational import sample_hot_keys

    tbl = _skewed_events()
    ds = ray.data.from_arrow(tbl).repartition(8)
    hot = sample_hot_keys(ds, "k", min_share=0.2)
    assert hot == ["hot"]
    # nothing hot at an impossible threshold
    assert sample_hot_keys(ds, "k", min_share=0.9) == []


def test_salted_grouped_topk_matches_unsalted(ray_session):
    from crawlray.ops.relational import grouped_topk, salted_grouped_topk

    tbl = _skewed_events()
    ds = ray.data.from_arrow(tbl).repartition(8)
    cols = ["k", "rid", "score"]
    want = _rows_sorted(
        grouped_topk(ds, ["k"], "score", 5, tiebreak_col="rid"), cols
    )
    got = _rows_sorted(
        salted_grouped_topk(
            ds, ["k"], "score", 5, tiebreak_col="rid", num_salts=8
        ),
        cols,
    )
    assert got == want
    # explicit hot_keys path (skips detection)
    got2 = _rows_sorted(
        salted_grouped_topk(
            ds, ["k"], "score", 5, tiebreak_col="rid",
            hot_keys=["hot"], num_salts=8,
        ),
        cols,
    )
    assert got2 == want


def test_salted_shuffle_join_matches_unsalted(ray_session):
    from crawlray.ops.relational import salted_shuffle_join, shuffle_join

    left = _skewed_events(n=3000)
    right = pa.table(
        {
            "k": ["hot"] + [f"cold-{i:02d}" for i in range(20)],
            "weight": np.arange(21, dtype=np.float64),
        }
    )
    lds = ray.data.from_arrow(left).repartition(6)
    rds = ray.data.from_arrow(right).repartition(2)
    cols = ["k", "rid", "weight"]
    want = _rows_sorted(shuffle_join(lds, rds, on=["k"]), cols)
    got = _rows_sorted(
        salted_shuffle_join(lds, rds, on="k", num_salts=8), cols
    )
    assert got == want
    assert len(got) == 3000  # every left row joined exactly once


def test_salted_shuffle_join_right_multirow_hot_key(ray_session):
    """Hot key with SEVERAL right rows: each left row must meet each
    matching right row exactly once (replication correctness)."""
    from crawlray.ops.relational import salted_shuffle_join, shuffle_join

    left = pa.table(
        {
            "k": ["hot"] * 50 + ["c0"] * 10,
            "rid": np.arange(60, dtype=np.int64),
        }
    )
    right = pa.table(
        {"k": ["hot", "hot", "hot", "c0"], "tag": [1, 2, 3, 4]}
    )
    lds = ray.data.from_arrow(left).repartition(4)
    rds = ray.data.from_arrow(right)
    cols = ["k", "rid", "tag"]
    want = _rows_sorted(shuffle_join(lds, rds, on=["k"]), cols)
    got = _rows_sorted(
        salted_shuffle_join(
            lds, rds, on="k", hot_keys=["hot"], num_salts=4
        ),
        cols,
    )
    assert got == want
    assert len(got) == 50 * 3 + 10


def test_salted_session_windows_matches_unsalted(ray_session):
    from crawlray.ops.relational import salted_session_windows, session_windows

    tbl = _skewed_events()
    ds = ray.data.from_arrow(tbl).repartition(8)
    cols = ["k", "session_id", "n_events", "t_start", "t_end"]
    want = _rows_sorted(session_windows(ds, "k", "ts", 30.0), cols)
    # small bucket (120 s ≈ a handful of events) forces MANY bucket splits
    # of the hot key that the merge phase must re-join correctly
    got = _rows_sorted(
        salted_session_windows(
            ds, "k", "ts", 30.0, bucket_seconds=120.0
        ),
        cols,
    )
    assert got == want


def test_salted_session_windows_numeric_seconds(ray_session):
    from crawlray.ops.relational import salted_session_windows, session_windows

    rng = np.random.default_rng(3)
    n = 1500
    tbl = pa.table(
        {
            "k": ["hot"] * (n - 100) + [f"c{i % 5}" for i in range(100)],
            "ts": np.cumsum(rng.integers(1, 40, size=n)).astype(np.float64),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    cols = ["k", "session_id", "n_events", "t_start", "t_end"]
    want = _rows_sorted(session_windows(ds, "k", "ts", 10.0), cols)
    got = _rows_sorted(
        salted_session_windows(
            ds, "k", "ts", 10.0, hot_keys=["hot"], bucket_seconds=200.0
        ),
        cols,
    )
    assert got == want


@pytest.mark.parametrize("seed,bucket", [(11, 37.0), (23, 61.0), (47, 500.0)])
def test_salted_session_windows_randomized(ray_session, seed, bucket):
    """Randomized corpora × awkward bucket sizes (buckets far smaller than
    and comparable to typical session spans): salted == unsalted always."""
    from crawlray.ops.relational import salted_session_windows, session_windows

    rng = np.random.default_rng(seed)
    n = 800
    keys = rng.choice(["hot", "hot", "hot", "a", "b"], size=n).tolist()
    ts = np.cumsum(rng.exponential(20.0, size=n))
    tbl = pa.table({"k": keys, "ts": ts})
    ds = ray.data.from_arrow(tbl).repartition(6)
    cols = ["k", "session_id", "n_events", "t_start", "t_end"]
    want = _rows_sorted(session_windows(ds, "k", "ts", 25.0), cols)
    got = _rows_sorted(
        salted_session_windows(
            ds, "k", "ts", 25.0, hot_keys=["hot"], bucket_seconds=bucket
        ),
        cols,
    )
    assert got == want
