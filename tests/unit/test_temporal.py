"""Unit tests for ops/temporal: as-of join and range (interval) join.

Every test checks the distributed operator against a brute-force
pure-Python reference on small deterministic inputs, plus parallelism
invariance (repartitioned input yields identical rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _mk_left(n=200, seed=7):
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "k": rng.randint(0, 5, n).astype("int64"),
            "t": rng.randint(0, 1000, n).astype("int64"),
            "lid": np.arange(n, dtype="int64"),
        }
    )


def _mk_right(n=60, seed=13):
    rng = np.random.RandomState(seed)
    t = rng.choice(np.arange(0, 1000, 7), n, replace=False).astype("int64")
    return pa.table(
        {
            "k": rng.randint(0, 5, n).astype("int64"),
            "t": t,
            "rid": np.arange(n, dtype="int64") + 1000,
            "w": rng.rand(n),
        }
    )


def _brute_asof(lt, rt, direction, tolerance=None, keyed=True):
    """dict lid -> (rid, w) or None."""
    out = {}
    rrows = list(zip(rt["k"].to_pylist(), rt["t"].to_pylist(),
                     rt["rid"].to_pylist(), rt["w"].to_pylist()))
    for k, t, lid in zip(lt["k"].to_pylist(), lt["t"].to_pylist(),
                         lt["lid"].to_pylist()):
        cands = [r for r in rrows if (not keyed or r[0] == k)]
        if direction == "backward":
            cands = [r for r in cands if r[1] <= t]
            cands.sort(key=lambda r: r[1])
            best = cands[-1] if cands else None
            if best and tolerance is not None and t - best[1] > tolerance:
                best = None
        else:
            cands = [r for r in cands if r[1] >= t]
            cands.sort(key=lambda r: r[1])
            best = cands[0] if cands else None
            if best and tolerance is not None and best[1] - t > tolerance:
                best = None
        out[lid] = (best[2], best[3]) if best else None
    return out


def _got_asof(ds):
    return {
        r["lid"]: (r["rid"], r["w"]) if r["rid"] is not None else None
        for r in ds.take_all()
    }


def test_asof_backward_inner(ray_session):
    from crawlray.ops.temporal import asof_join

    lt, rt = _mk_left(), _mk_right()
    out = asof_join(
        ray.data.from_arrow(lt).repartition(7),
        ray.data.from_arrow(rt).repartition(3),
        on="t", by="k", right_payload=["rid", "w"], join_type="inner",
    )
    want = {k: v for k, v in _brute_asof(lt, rt, "backward").items() if v}
    assert _got_asof(out) == want


def test_asof_forward_and_left(ray_session):
    from crawlray.ops.temporal import asof_join

    lt, rt = _mk_left(seed=21), _mk_right(seed=22)
    out = asof_join(
        ray.data.from_arrow(lt),
        ray.data.from_arrow(rt),
        on="t", by="k", right_payload=["rid", "w"],
        direction="forward", join_type="left",
    )
    want = _brute_asof(lt, rt, "forward")
    got = _got_asof(out)
    assert got == want
    assert any(v is None for v in want.values())  # left-join nulls exercised


def test_asof_tolerance(ray_session):
    from crawlray.ops.temporal import asof_join

    lt, rt = _mk_left(seed=31), _mk_right(seed=32)
    out = asof_join(
        ray.data.from_arrow(lt),
        ray.data.from_arrow(rt),
        on="t", by="k", right_payload=["rid", "w"],
        tolerance=50, join_type="left",
    )
    want = _brute_asof(lt, rt, "backward", tolerance=50)
    assert _got_asof(out) == want


def test_asof_broadcast_matches_grouped_semantics(ray_session):
    from crawlray.ops.temporal import asof_join_broadcast

    lt, rt = _mk_left(seed=41), _mk_right(seed=42)
    out = asof_join_broadcast(
        ray.data.from_arrow(lt).repartition(5),
        rt, on="t", right_payload=["rid", "w"], join_type="left",
    )
    want = _brute_asof(lt, rt, "backward", keyed=False)
    assert _got_asof(out) == want


def test_asof_empty_right_group(ray_session):
    """Keys with zero right rows: dropped (inner) / null (left)."""
    from crawlray.ops.temporal import asof_join

    lt = pa.table({"k": [1, 2], "t": [10, 10], "lid": [0, 1]})
    rt = pa.table({"k": [1], "t": [5], "rid": [100], "w": [0.5]})
    inner = asof_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="t", by="k", right_payload=["rid", "w"],
    )
    assert _got_asof(inner) == {0: (100, 0.5)}
    left = asof_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="t", by="k", right_payload=["rid", "w"], join_type="left",
    )
    assert _got_asof(left) == {0: (100, 0.5), 1: None}


def _brute_range(lt, rt):
    pairs = set()
    for t, lid in zip(lt["t"].to_pylist(), lt["lid"].to_pylist()):
        for ws, we, wid in zip(rt["ws"].to_pylist(), rt["we"].to_pylist(),
                               rt["wid"].to_pylist()):
            if ws <= t <= we:
                pairs.add((lid, wid))
    return pairs


def test_range_join_exactly_once(ray_session):
    """Intervals spanning MANY buckets still emit each pair exactly once,
    and inclusive endpoints match SQL BETWEEN."""
    from crawlray.ops.temporal import range_join

    rng = np.random.RandomState(5)
    n = 300
    lt = pa.table(
        {"t": rng.randint(0, 2000, n).astype("int64"),
         "lid": np.arange(n, dtype="int64")}
    )
    ws = rng.randint(0, 1900, 40).astype("int64")
    ln = rng.randint(0, 400, 40).astype("int64")  # up to 4x bucket width
    rt = pa.table(
        {"ws": ws, "we": ws + ln, "wid": np.arange(40, dtype="int64")}
    )
    out = range_join(
        ray.data.from_arrow(lt).repartition(6),
        ray.data.from_arrow(rt).repartition(4),
        left_ts="t", right_start="ws", right_end="we", bucket_width=100,
    )
    rows = out.take_all()
    got = [(r["lid"], r["wid"]) for r in rows]
    assert len(got) == len(set(got))  # exactly-once, no dup pairs
    assert set(got) == _brute_range(lt, rt)
    # endpoint inclusivity: plant exact-boundary hits
    lt2 = pa.table({"t": pa.array([10, 20], pa.int64()),
                    "lid": pa.array([0, 1], pa.int64())})
    rt2 = pa.table({"ws": pa.array([10], pa.int64()),
                    "we": pa.array([20], pa.int64()),
                    "wid": pa.array([7], pa.int64())})
    out2 = range_join(
        ray.data.from_arrow(lt2), ray.data.from_arrow(rt2),
        left_ts="t", right_start="ws", right_end="we", bucket_width=100,
    )
    assert sorted((r["lid"], r["wid"]) for r in out2.take_all()) == [
        (0, 7), (1, 7)
    ]


def test_range_join_column_collision_renamed(ray_session):
    from crawlray.ops.temporal import range_join

    lt = pa.table({"t": pa.array([5], pa.int64()),
                   "tag": pa.array(["L"])})
    rt = pa.table({"ws": pa.array([0], pa.int64()),
                   "we": pa.array([9], pa.int64()),
                   "tag": pa.array(["R"])})
    out = range_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        left_ts="t", right_start="ws", right_end="we", bucket_width=4,
    )
    rows = out.take_all()
    assert len(rows) == 1
    assert rows[0]["tag"] == "L" and rows[0]["tag_r"] == "R"


def test_range_join_empty_sides(ray_session):
    """Round 5: an empty side must yield a typed empty result, not crash
    Ray's hash-shuffle join on schema-less empty partitions."""
    import pyarrow as pa
    import ray.data

    from crawlray.ops.temporal import range_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "ts": pa.array([100], pa.int64())})
    )
    empty_right = ray.data.from_arrow(
        pa.table(
            {"start": pa.array([], pa.int64()), "end": pa.array([], pa.int64())}
        )
    )
    out = range_join(
        left, empty_right, left_ts="ts", right_start="start",
        right_end="end", bucket_width=100,
    )
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "ts", "start", "end"}

    empty_left = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "ts": pa.array([], pa.int64())})
    )
    ivals = ray.data.from_arrow(
        pa.table(
            {"start": pa.array([0], pa.int64()), "end": pa.array([500], pa.int64())}
        )
    )
    out2 = range_join(
        empty_left, ivals, left_ts="ts", right_start="start",
        right_end="end", bucket_width=100,
    )
    assert out2.count() == 0
