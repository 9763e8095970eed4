"""Relational operators over ray.data.Dataset (SURVEY.md §2.4–2.7).

The reference engine (single-process PyCrawler-class loop; SURVEY.md §0) has
no relational algebra — these operators cover the QA/aggregation surface the
driver checks via DuckDB oracles, and are the same kernels the crawl engine
uses (e.g. the broadcast lookup pattern backs O-25, the anti-join backs the
seen-set semantics of O-26).

Scale notes baked into each op:
  * small sides are broadcast once via `ray.put` and joined per batch with
    Arrow kernels — never re-shipped per batch, never a shuffle;
  * large-large joins go through `Dataset.join` (hash shuffle both sides);
  * aggregates use Ray Data's partial+final tree aggregation (no driver
    materialization of the big side).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def broadcast_join(
    big: ray.data.Dataset,
    small: pa.Table,
    keys: list[str],
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Join a big Dataset against a small in-memory Arrow table.

    The small side is put in the object store ONCE; every map task reads it
    zero-copy and runs a vectorized Arrow (Acero) join per batch. This is the
    broadcast-hash-join pattern — no shuffle of the big side.
    """
    small_ref = ray.put(small)

    def _join(batch: pa.Table) -> pa.Table:
        rhs = ray.get(small_ref)
        return batch.join(rhs, keys=keys, join_type=join_type)

    return big.map_batches(_join, batch_format="pyarrow")


def shuffle_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    right_on: list[str] | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Large-large distributed join: hash-shuffle BOTH sides on the key
    (`ray.data.Dataset.join`, present since Ray 2.46; each of the
    `num_partitions` key ranges is joined independently by an aggregator
    actor, so neither side is ever materialized on one node).

    Chooser — which join to use:
      * one side fits comfortably in a worker's heap (dimension table,
        lookup set): `broadcast_join` — no shuffle at all, the big side
        streams;
      * both sides large (fact ⋈ fact, e.g. documents ⋈ crawl_log at full
        corpus scale): this — O(|L|+|R|) network, bounded per-partition
        memory; raise `num_partitions` until a partition of the LARGER side
        fits in an aggregator's heap;
      * key skew: pre-salt the hot keys (append `url_hash_lo % S` to the
        key columns of both sides for the hot-key subset) before calling.
    """
    if num_partitions is None:
        # ~1 partition per CPU: each is joined by one aggregator task
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on is not None else None,
    )


def broadcast_semi_anti(
    big: ray.data.Dataset,
    key: str,
    small_keys: pa.Array | pa.ChunkedArray | list,
    anti: bool = False,
) -> ray.data.Dataset:
    """Semi/anti join: keep rows whose key is (not) in the small key set."""
    if isinstance(small_keys, list):
        small_keys = pa.array(small_keys)
    keys_ref = ray.put(small_keys)

    def _filter(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pc.is_in(batch.column(key), value_set=ks)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return big.map_batches(_filter, batch_format="pyarrow")


def distinct(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """Distinct rows over cols — a groupby shuffle with no aggregates kept."""
    return ds.groupby(cols).count().select_columns(cols)


def topk(
    ds: ray.data.Dataset,
    keys: list[str],
    k: int,
    descending: bool | list[bool] = True,
) -> ray.data.Dataset:
    """Global top-k: range-shuffle sort + limit (the limit prunes blocks).

    Pass a unique tiebreak column last in `keys` so results are deterministic.
    """
    return ds.sort(keys, descending=descending).limit(k)


def hash_sample(
    ds: ray.data.Dataset, key: str, buckets_kept: int, total_buckets: int = 256
) -> ray.data.Dataset:
    """Deterministic content-keyed sample (O-36, the reproducible variant).

    Keeps rows whose md5(key) falls in the first `buckets_kept` of
    `total_buckets` hex-prefix buckets — e.g. (25, 256) ≈ a 9.8% sample.
    Unlike `Dataset.random_sample`, the kept set is a pure function of the
    key: stable across runs, parallelism levels and engines (the DuckDB
    oracle expresses the same predicate as
    `substr(md5(key), 1, 2) < '<hex>'`), and consistent between tables —
    sampling two tables by the same join key keeps matching rows together,
    which a per-row RNG cannot do. Per-batch work is a vectorized string
    compare on the 2-hex-char prefix; only the md5 itself is per-row.
    """
    if total_buckets != 256:
        raise ValueError("total_buckets must be 256 (2 hex chars)")
    if not 0 <= buckets_kept <= 256:
        raise ValueError("buckets_kept must be in [0, 256]")
    if buckets_kept == 256:
        return ds  # keep-all: '100' would compare lexicographically wrong
    threshold = format(buckets_kept, "02x")
    import hashlib

    def _sample(batch: pa.Table) -> pa.Table:
        prefixes = pa.array(
            hashlib.md5(str(v).encode("utf-8")).hexdigest()[:2]
            for v in batch.column(key).to_pylist()
        )
        return batch.filter(pc.less(prefixes, threshold))

    return ds.map_batches(_sample, batch_format="pyarrow")


def grouped_topk(
    ds: ray.data.Dataset,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> ray.data.Dataset:
    """Top-k rows per group (SQL: QUALIFY ROW_NUMBER() OVER (PARTITION BY
    group ORDER BY order_col [DESC]) <= k).

    One groupby shuffle co-locates each group; the per-group kernel is a
    vectorized argsort + head-k — group sizes bound the memory, never the
    dataset. Pass `tiebreak_col` (unique within groups) for a deterministic
    winner when order_col has ties.
    """
    import numpy as np

    def _topk(group: pa.Table) -> pa.Table:
        v = group.column(order_col).to_numpy(zero_copy_only=False)
        keys = [v if not descending else -v]
        if tiebreak_col is not None:
            keys = [group.column(tiebreak_col).to_numpy(zero_copy_only=False)] + keys
        order = np.lexsort(tuple(keys))
        return group.take(pa.array(order[:k]))

    return ds.groupby(group_cols).map_groups(_topk, batch_format="pyarrow")


def session_windows(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    gap_seconds: float,
) -> ray.data.Dataset:
    """Gap-based session windows per key — the streaming windowed-aggregate
    shape (sessionization) as a batch operator.

    Events for one key more than `gap_seconds` apart start a new session.
    ONE groupby(key) shuffle co-locates each key's events; per-group work is
    a vectorized sort + diff + bincount (no per-event Python). Session ids
    are 0-based in time order, so output is a pure function of the data —
    deterministic under any parallelism (equal timestamps share a session
    regardless of sort-tie order). `ts_col` may be a timestamp column (gaps
    measured in real time) or a plain numeric column interpreted as SECONDS
    — numeric deltas are NOT reinterpreted as timedelta64[us] (ADVICE r2).
    Output: (key, session_id, n_events, t_start, t_end).
    """
    import numpy as np

    gap_us = int(gap_seconds * 1_000_000)

    def _sess(group: pa.Table) -> pa.Table:
        ts = group.column(ts_col).to_numpy()
        order = np.argsort(ts, kind="stable")
        ts_s = ts[order]
        n = len(ts_s)
        if n == 0:
            return pa.table(
                {
                    key: group.column(key).slice(0, 0),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "t_start": pa.array(ts_s),
                    "t_end": pa.array(ts_s),
                }
            )
        if ts_s.dtype.kind == "M":  # datetime64 → compare in microseconds
            gaps = np.diff(ts_s).astype("timedelta64[us]").astype(np.int64)
            new = np.concatenate([[True], gaps > gap_us])
        elif ts_s.dtype.kind in "iuf":  # numeric → values are seconds
            gaps = np.diff(ts_s.astype(np.float64))
            new = np.concatenate([[True], gaps > float(gap_seconds)])
        else:
            raise TypeError(
                f"session_windows: ts_col {ts_col!r} has unsupported dtype "
                f"{ts_s.dtype} (need timestamp or numeric seconds)"
            )
        sess = np.cumsum(new) - 1
        counts = np.bincount(sess)
        start_idx = np.nonzero(new)[0]
        end_idx = np.nonzero(np.concatenate([new[1:], [True]]))[0]
        return pa.table(
            {
                key: group.column(key).take(
                    pa.array(np.zeros(len(counts), np.int64))
                ),
                "session_id": pa.array(
                    np.arange(len(counts), dtype=np.int64), pa.int64()
                ),
                "n_events": pa.array(counts.astype(np.int64), pa.int64()),
                "t_start": pa.array(ts_s[start_idx]),
                "t_end": pa.array(ts_s[end_idx]),
            }
        )

    return ds.groupby(key).map_groups(_sess, batch_format="pyarrow")


def single_row_agg(ds: ray.data.Dataset, aggs) -> pa.Table:
    """Global (non-grouped) aggregate → a one-row Arrow table.

    Ray Data computes this as partial per-block aggregates + a tree combine;
    only the final scalar row lands on the driver.
    """
    out = ds.aggregate(*aggs)
    return pa.Table.from_pylist([out])
