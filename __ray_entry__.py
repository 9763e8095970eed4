"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).

Operator ↔ SURVEY.md §2 mapping is given per query in ``queries()``.
Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in crawlray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# Make the repo importable for THIS process (driver may import us from any
# cwd) and force by-value cloudpickle serialization of our packages so Ray
# workers never need `crawlray` on their own sys.path.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


import crawlray  # noqa: E402

crawlray.ensure_worker_importability()

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _rd(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _round_cols(ds: ray.data.Dataset, cols: dict[str, int]) -> ray.data.Dataset:
    """Round float columns so distributed float-sum jitter can't flip the
    driver's value-hash vs DuckDB (both sides round identically)."""

    def _r(batch: pa.Table) -> pa.Table:
        out = {}
        for name in batch.column_names:
            col = batch.column(name)
            if name in cols:
                col = pc.round(col, ndigits=cols[name])
            out[name] = col
        return pa.table(out)

    return ds.map_batches(_r, batch_format="pyarrow")


# --------------------------------------------------------------------------
# flagship entry
# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: a full distributed crawl.

    Derives a deterministic synthetic web sized from the sf0.001 documents
    row count (FIXTURES.md §6 — the driver documents table is flat, not the
    interleaved-span shape), crawls it with the Ray wave engine, and returns
    the DOCUMENTS dataset (doc_id + interleaved text/media spans).
    """
    sf_dir = "/root/testdata/sf0.001"
    n = _rd(sf_dir, "documents", columns=["doc_id"]).count()
    from crawlray.job import run_crawl
    from crawlray.synthgraph import SynthWeb

    web = SynthWeb(seed=42, shape="zipf_hosts", n_urls=max(50, n), n_hosts=8)
    res = run_crawl(
        seeds=web.default_seeds(),
        web=web,
        budget_per_host=3,
        max_pages=min(200, n),
    )
    return res.documents


# --------------------------------------------------------------------------
# queries — one per implemented operator/pipeline (SURVEY.md §2)
# --------------------------------------------------------------------------


def _q1_agg(sf_dir: str):
    """O-28/O-29: grouped aggregation (TPC-H Q1 style) over lineitem."""
    ds = _rd(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_price"),
        Mean("l_discount", alias_name="avg_disc"),
        Count(alias_name="n"),
    )
    return _round_cols(out, {"sum_qty": 2, "sum_price": 2, "avg_disc": 6})


def _groupby_counts(sf_dir: str):
    """O-28: per-key counts + sums over events."""
    ds = _rd(sf_dir, "events", columns=["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("value", alias_name="total_value")
    )
    return _round_cols(out, {"total_value": 3})


def _global_agg(sf_dir: str):
    """O-29: global (non-grouped) aggregate over lineitem, now including
    the statistical moments (AVG / STDDEV_SAMP / CORR) via the
    Chan-combine distributed moments kernel (ops/relational.moments) —
    per-block Welford partials, bit-deterministic driver fold, one
    streaming pass shared across all three moment columns."""
    from crawlray.ops.relational import moments, single_row_agg

    ds = _rd(
        sf_dir, "lineitem",
        columns=["l_quantity", "l_extendedprice", "l_discount"],
    )
    tbl = single_row_agg(
        ds,
        [
            Count(alias_name="n"),
            Sum("l_quantity", alias_name="sum_qty"),
            Max("l_extendedprice", alias_name="max_price"),
            Min("l_discount", alias_name="min_disc"),
        ],
    )
    mo = moments(ds, "l_quantity", "l_extendedprice")
    return pa.table(
        {
            "n": tbl.column("n"),
            "sum_qty": pc.round(tbl.column("sum_qty"), ndigits=2),
            "max_price": tbl.column("max_price"),
            "min_disc": tbl.column("min_disc"),
            "avg_price": pa.array([round(mo["mean_y"], 4)], pa.float64()),
            "std_price": pa.array([round(mo["std_y"], 4)], pa.float64()),
            "corr_qty_price": pa.array(
                [round(mo["corr_xy"], 6)], pa.float64()
            ),
        }
    )


def _dedup_first(sf_dir: str):
    """O-30/O-38: full-row keep-first dedup (events by user_id, min
    event_id) on the HASH-PARTITIONED path (VERDICT r3 item 5): one hash
    shuffle, per-partition vectorized keep-first — no global sort, no
    boundary repair. The sort-based variant keeps its own coverage in
    tests/unit/test_dedup.py."""
    from crawlray.ops.dedup import dedup_keep_first_hash

    return dedup_keep_first_hash(
        _rd(sf_dir, "events"), key="user_id", order="event_id"
    )


def _global_sort_topk(sf_dir: str):
    """O-33/O-34: global sort + limit (orders by totalprice desc)."""
    from crawlray.ops.relational import topk

    return topk(
        _rd(sf_dir, "orders"),
        keys=["o_totalprice", "o_orderkey"],
        k=100,
        descending=[True, False],
    )


def _hash_join(sf_dir: str):
    """O-25/O-27: broadcast hash join orders ⋈ customer (small side ray.put once)."""
    from crawlray.ops.relational import broadcast_join

    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).rename_columns(["o_custkey", "c_name", "c_mktsegment"])
    orders = _rd(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, cust, keys=["o_custkey"])
    return joined.select_columns(["o_orderkey", "o_totalprice", "c_name", "c_mktsegment"])


def _join_agg(sf_dir: str):
    """O-27+O-28: join then grouped aggregate (revenue per market segment)."""
    from crawlray.ops.relational import broadcast_join

    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).rename_columns(["o_custkey", "c_mktsegment"])
    orders = _rd(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, cust, keys=["o_custkey"])
    out = joined.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders")
    )
    return _round_cols(out, {"revenue": 2})


def _shuffle_join(sf_dir: str):
    """O-27 at scale: large-large shuffle hash join lineitem ⋈ orders (both
    fact tables; neither side broadcast — `Dataset.join` hash-partitions
    both and joins each partition independently)."""
    from crawlray.ops.relational import shuffle_join

    li = _rd(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_quantity", "l_extendedprice"],
    )
    orders = _rd(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    )
    out = shuffle_join(li, orders, on=["l_orderkey"], right_on=["o_orderkey"])
    return out.select_columns(
        ["l_orderkey", "l_quantity", "l_extendedprice", "o_orderstatus", "o_totalprice"]
    )


def _left_outer_join(sf_dir: str):
    """O-27 join-type coverage, LEFT and FULL OUTER in one tagged result.
    kind='left': every customer row survives; customers with no completed
    ('F') orders get null order columns (71 of them at sf0.01 — the
    anti_join population). kind='full': the left side restricted to the
    BUILDING segment so BOTH null directions occur — null order columns
    for building customers without F orders AND null customer columns
    for F orders of other segments. Nulls coalesced to sentinels
    identically on engine and oracle so the value-hash is null-stable."""
    from crawlray.ops.relational import shuffle_join

    cust = _rd(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    f_orders = (
        _rd(
            sf_dir, "orders",
            columns=["o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus"],
        )
        .filter(expr="o_orderstatus == 'F'")
        .select_columns(["o_custkey", "o_orderkey", "o_totalprice"])
    )

    def _fill(kind: str):
        def _f(batch: pa.Table) -> pa.Table:
            # Ray's outer joins already coalesce on/right_on into the
            # left key column, so c_custkey is complete in both kinds
            return pa.table(
                {
                    "kind": pa.array(
                        [kind] * batch.num_rows, pa.string()
                    ),
                    "c_custkey": pc.cast(
                        batch.column("c_custkey"), pa.int64()
                    ),
                    "c_mktsegment": pc.fill_null(
                        batch.column("c_mktsegment"), "(none)"
                    ),
                    "o_orderkey": pc.fill_null(
                        pc.cast(batch.column("o_orderkey"), pa.int64()), -1
                    ),
                    "o_totalprice": pc.fill_null(
                        pc.cast(batch.column("o_totalprice"), pa.float64()),
                        -1.0,
                    ),
                }
            )

        return _f

    left = shuffle_join(
        cust, f_orders, on=["c_custkey"], right_on=["o_custkey"],
        join_type="left_outer",
    ).map_batches(_fill("left"), batch_format="pyarrow")
    full = shuffle_join(
        cust.filter(expr="c_mktsegment == 'BUILDING'"),
        f_orders,
        on=["c_custkey"],
        right_on=["o_custkey"],
        join_type="full_outer",
    ).map_batches(_fill("full"), batch_format="pyarrow")
    return left.union(full)


def _pagerank(sf_dir: str):
    """Link-analysis pair over a deterministic lineitem-derived graph
    (src = l_partkey % 211, dst = l_suppkey % 211, distinct, no
    self-loops), one tagged table (kind, node, v): kind='pr' —
    distributed PageRank (4 iterations, d=0.85), every node's rank
    rounded to 8 decimals on both sides (oracle: chained CTEs);
    kind='hits_auth'/'hits_hub' — unnormalized integer HITS (3 rounds,
    ops/graph.hits_scores): hub/authority crawl-prioritization scores
    whose int64 sums make the distributed reduce exact with no rounding
    hedge (oracle: MATERIALIZED a/h CTE rounds)."""
    from crawlray.ops.graph import hits_scores, pagerank

    li = _rd(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def _edges(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        src = pa.array(pk % 211, pa.int64())
        dst = pa.array(sk % 211, pa.int64())
        return pa.table({"src": src, "dst": dst}).filter(pc.not_equal(src, dst))

    edges = li.map_batches(_edges, batch_format="pyarrow").groupby(
        ["src", "dst"]
    ).count().select_columns(["src", "dst"]).materialize()
    pr = _round_cols(pagerank(edges, n_iters=4, damping=0.85), {"rank": 8})

    def _tag_pr(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["pr"] * batch.num_rows, pa.string()),
                "node": batch.column("node"),
                "v": batch.column("rank"),
            }
        )

    ht = hits_scores(edges, n_iters=3)

    def _melt_hits(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "kind": pa.array(["hits_auth"] * n, pa.string()),
                        "node": batch.column("node"),
                        "v": pc.cast(batch.column("auth"), pa.float64()),
                    }
                ),
                pa.table(
                    {
                        "kind": pa.array(["hits_hub"] * n, pa.string()),
                        "node": batch.column("node"),
                        "v": pc.cast(batch.column("hub"), pa.float64()),
                    }
                ),
            ]
        )

    return pr.map_batches(_tag_pr, batch_format="pyarrow").union(
        ht.map_batches(_melt_hits, batch_format="pyarrow")
    )


def _anti_join(sf_dir: str):
    """O-26 kernel: anti join — customers with no completed ('F') orders."""
    from crawlray.ops.relational import broadcast_semi_anti

    custkeys = (
        _rd(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
        .filter(expr="o_orderstatus == 'F'")
        .unique("o_custkey")
    )
    return broadcast_semi_anti(
        _rd(sf_dir, "customer"), key="c_custkey", small_keys=custkeys, anti=True
    )


def _quantiles(sf_dir: str):
    """Exact distributed quantiles (percentile_cont semantics), global AND
    per-group in one tagged table (VERDICT r3 item 1 consolidation):
    lineitem.l_extendedprice globally via the sort + O(#blocks)
    rank-select path (no driver rows), plus per-order-status quantiles of
    orders.o_totalprice via the grouped shuffle path, each over the SAME
    quantile list. Global rows carry o_orderstatus='(all)'. A third arm
    (the window-packing merge that freed the slot for the oracled
    minhash_signatures): KMV bottom-k APPROXIMATE quantiles of
    events.value — the sample is a pure function of the data, so even the
    approximate answer is SQL-oracled (quantile_cont over ORDER BY md5
    LIMIT k); its row carries o_orderstatus='(kmv:events.value)'.
    Error-vs-exact bounds ride tests/unit/test_sketch.py."""
    from crawlray.ops.seqassign import exact_quantiles, grouped_quantiles
    from crawlray.ops.sketch import approx_quantiles

    qs = [0.25, 0.5, 0.75, 0.95]
    grouped = grouped_quantiles(
        _rd(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"]),
        group_cols=["o_orderstatus"], col="o_totalprice", qs=qs,
    )
    grouped = _round_cols(grouped, {"q25": 4, "q50": 4, "q75": 4, "q95": 4})
    g25, g50, g75, g95 = exact_quantiles(
        _rd(sf_dir, "lineitem", columns=["l_extendedprice"]),
        "l_extendedprice", qs,
    )
    kmv = approx_quantiles(
        _rd(sf_dir, "events", columns=["event_id", "value"]),
        value_col="value", key_col="event_id", qs=qs, k=2000,
    )
    glob = ray.data.from_arrow(
        pa.table(
            {
                "o_orderstatus": pa.array(["(all)", "(kmv:events.value)"]),
                "q25": pa.array(
                    [round(g25, 4), round(kmv.column("q0_25")[0].as_py(), 4)]
                ),
                "q50": pa.array(
                    [round(g50, 4), round(kmv.column("q0_5")[0].as_py(), 4)]
                ),
                "q75": pa.array(
                    [round(g75, 4), round(kmv.column("q0_75")[0].as_py(), 4)]
                ),
                "q95": pa.array(
                    [round(g95, 4), round(kmv.column("q0_95")[0].as_py(), 4)]
                ),
            }
        )
    )
    return grouped.union(glob)


def _grouped_topk(sf_dir: str):
    """Window-rank top-k per group: 5 highest-value orders per status
    (deterministic tie-break by o_orderkey)."""
    from crawlray.ops.relational import grouped_topk

    return grouped_topk(
        _rd(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"]),
        group_cols=["o_orderstatus"], order_col="o_totalprice", k=5,
        descending=True, tiebreak_col="o_orderkey",
    )


def _session_windows(sf_dir: str):
    """Sessionization, plain AND skew-salted in one tagged table (the
    VERDICT-r3 window-packing pattern — both engine paths still run and
    oracle-check). kind='plain': per-user gap sessions (30-min gap)
    through the unsalted operator. kind='salted': per-event_type sessions
    (10-min gap, every key hot — hot keys split into 1-hour time buckets,
    sessionized per (key, bucket) in parallel, ONLY per-bucket summaries
    merge). Key columns are cast to string so both share one schema."""
    from crawlray.ops.relational import (
        salted_session_windows,
        session_windows,
    )

    def _norm(key_col: str, kind: str):
        def _m(batch: pa.Table) -> pa.Table:
            out = batch.set_column(
                batch.column_names.index(key_col),
                "key",
                pc.cast(batch.column(key_col), pa.string()),
            )
            return out.append_column(
                "kind", pa.array([kind] * batch.num_rows, pa.string())
            )

        return _m

    plain = session_windows(
        _rd(sf_dir, "events", columns=["user_id", "ts"]),
        key="user_id", ts_col="ts", gap_seconds=1800,
    ).map_batches(_norm("user_id", "plain"), batch_format="pyarrow")
    salted = salted_session_windows(
        _rd(sf_dir, "events", columns=["event_type", "ts"]),
        key="event_type", ts_col="ts", gap_seconds=600,
        bucket_seconds=3600.0,
    ).map_batches(_norm("event_type", "salted"), batch_format="pyarrow")
    return plain.union(salted)


def _set_ops(sf_dir: str):
    """SQL EXCEPT + INTERSECT, one tagged groupby each (no join), merged
    into one tagged result so both set operators get a driver row inside
    the 50-entry CORRECTNESS window (VERDICT r3 item 1): (user, day)
    pairs with a view but no purchase (op='except') and pairs with both
    (op='intersect')."""
    from crawlray.ops.relational import set_op

    ev = _rd(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def _days(evtype):
        def _m(batch: pa.Table) -> pa.Table:
            b = batch.filter(pc.equal(batch.column("event_type"), evtype))
            return pa.table(
                {
                    "user_id": b.column("user_id"),
                    "day": pc.floor_temporal(b.column("ts"), unit="day"),
                }
            )

        return _m

    views = ev.map_batches(_days("view"), batch_format="pyarrow")
    buys = ev.map_batches(_days("purchase"), batch_format="pyarrow")

    def _tag(op: str):
        def _m(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "op", pa.array([op] * batch.num_rows, pa.string())
            )

        return _m

    exc = set_op(views, buys, ["user_id", "day"], op="except").map_batches(
        _tag("except"), batch_format="pyarrow"
    )
    its = set_op(views, buys, ["user_id", "day"], op="intersect").map_batches(
        _tag("intersect"), batch_format="pyarrow"
    )
    return exc.union(its)


def _pivot_unpivot(sf_dir: str):
    """PIVOT then UNPIVOT round-trip in one query (consolidated from two
    separate driver entries per the VERDICT-r3 window-packing pattern —
    both kernels still execute and oracle-check): events pivot to one
    summed value column per event type (one groupby), then melt back to
    long form (pure map, no shuffle)."""
    from crawlray.ops.relational import pivot_agg, unpivot

    kinds = ["click", "error", "purchase", "signup", "view"]
    wide = _round_cols(
        pivot_agg(
            _rd(sf_dir, "events", columns=["user_id", "event_type",
                                           "value"]),
            group_col="user_id", pivot_col="event_type", value_col="value",
            pivot_values=kinds,
        ),
        {f"v_{v}": 3 for v in kinds},
    )
    return unpivot(
        wide, id_cols=["user_id"], value_cols=[f"v_{v}" for v in kinds]
    )


# RE2 PII patterns shared verbatim with the SQL oracle (corpusprep
# defines them; repeated inline in the oracle string below).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def _redact_pii(sf_dir: str):
    """PII redaction over documents whose text gets DETERMINISTIC planted
    PII first (the synthetic corpus has none): doc_id%3==0 rows gain an
    email, %4==0 an IPv4, %5==0 an SSN-shaped id — all derived from
    doc_id alone so the DuckDB oracle rebuilds the identical augmented
    text with string concat, then mirrors the same sequential
    count-then-replace regex chain. Engine shape: two stateless
    map_batches (plant, redact) — zero shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from crawlray.ops.corpusprep import redact_pii

    def _plant(b: pa.Table) -> pa.Table:
        did = b.column("doc_id")
        s = pc.cast(did, pa.string())

        def _mod(m: int):
            # no pc.mod in this pyarrow; int divide IS floor-div on int64
            # and doc_id >= 0, so x - (x // m) * m is exact
            return pc.subtract(did, pc.multiply(pc.divide(did, m), m))

        def _m(base: int, mod: int) -> pa.Array:
            return pc.cast(pc.add(base, _mod(mod)), pa.string())

        def _when(mod: int, part) -> pa.Array:
            return pc.if_else(pc.equal(_mod(mod), 0), part, "")

        j = pc.binary_join_element_wise
        email = _when(3, j(" contact u", s, "@example.com", ""))
        ip = _when(
            4,
            j(" from 10.", _m(100, 150), ".", _m(0, 250), ".", _m(0, 100),
              ""),
        )
        ssn = _when(
            5,
            j(" ssn ", _m(100, 900), "-", _m(10, 90), "-", _m(1000, 9000),
              ""),
        )
        return pa.table(
            {
                "doc_id": did,
                "text": j(b.column("text"), email, ip, ssn, ""),
            }
        )

    planted = _rd(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _plant, batch_format="pyarrow"
    )
    return redact_pii(planted, text_col="text")


def _group_rank(sf_dir: str):
    """RANK / DENSE_RANK / ROW_NUMBER per customer over order price."""
    from crawlray.ops.relational import group_rank

    return group_rank(
        _rd(sf_dir, "orders"), key="o_custkey", order_col="o_totalprice",
        tiebreak_col="o_orderkey", descending=True,
    )


def _window_functions(sf_dir: str):
    """SQL window functions (LAG / LEAD / running SUM / ROW_NUMBER /
    PERCENT_RANK / CUME_DIST / NTILE over a partition): one groupby(user)
    shuffle, vectorized per-group kernel — the unique (ts, event_id)
    order makes the rank family exact."""
    from crawlray.ops.relational import window_shift_cum

    out = window_shift_cum(
        _rd(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"]),
        key="user_id", order_cols=["ts", "event_id"], value_col="value",
        ntile_k=4,
    )
    return _round_cols(
        out,
        {
            "lag_value": 6,
            "lead_value": 6,
            "running_sum": 6,
            "pct_rank": 6,
            "cume_dist": 6,
        },
    )


def _rollup(sf_dir: str):
    """GROUP BY ROLLUP and CUBE over lineitem flags in one tagged result
    (kind='rollup'/'cube'), rolled-up keys carrying the '(all)' sentinel.
    ONE engine pass: cube_agg takes a single data exchange (coarser sets
    re-aggregate the materialized finest level — grouping_sets_agg), and
    the rollup rows are the cube rows minus the linestatus-only set
    (sentinel test is unambiguous: real flags are single letters)."""
    from crawlray.ops.relational import cube_agg

    cube = cube_agg(
        _rd(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus",
                                         "l_quantity"]),
        keys=["l_returnflag", "l_linestatus"], value_col="l_quantity",
    ).materialize()

    def _tag(kind: str):
        def _t(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "kind": pa.array([kind] * batch.num_rows, pa.string()),
                    **{c: batch.column(c) for c in batch.column_names},
                }
            )

        return _t

    # De Morgan spelling: Ray's expr parser has no `not`
    rollup = cube.filter(
        expr="l_returnflag != '(all)' or l_linestatus == '(all)'"
    )
    out = cube.map_batches(_tag("cube"), batch_format="pyarrow").union(
        rollup.map_batches(_tag("rollup"), batch_format="pyarrow")
    )
    return _round_cols(out, {"sum_v": 2})


def _bloom_semi_join(sf_dir: str):
    """EXACT semi join via a Bloom pre-filter (no false negatives) +
    shuffle verification of the candidates only."""
    from crawlray.ops.relational import bloom_semi_join

    return bloom_semi_join(
        _rd(sf_dir, "customer"),
        _rd(sf_dir, "orders", columns=["o_custkey"]).rename_columns(
            ["c_custkey"]
        ),
        key="c_custkey",
    )


def _pack_sequences(sf_dir: str):
    """Sequence packing for training-data prep (concat-and-chunk): docs
    concatenated per source in doc_id order, the token stream cut every
    256 tokens; each doc reports its running token total and the pack its
    first token lands in. Distributed via the O-33 order-assignment shape
    (one range sort + O(#blocks + #sources) driver metadata), never a
    whole-source map_groups."""
    from crawlray.ops.corpusprep import pack_sequences

    return pack_sequences(
        _rd(sf_dir, "documents", columns=["source", "doc_id", "text"]),
        budget=256,
    )


def _decontaminate(sf_dir: str):
    """Benchmark decontamination, BOTH granularities in one tagged table
    (benchmark = 16/256 md5 buckets of doc_id — the same deterministic
    split the oracle expresses). kind='doc': contaminated docs with their
    distinct-shared-gram count as (a=doc_id, b=n_hits, v=''). kind='span':
    the merged token spans the shared grams cover (the cut list), as
    (a=doc_id, b=span_start, v='span_end:n_grams'). One benchmark gram
    set feeds both; the corpus gram streams ride the Bloom semi-join."""
    from crawlray.ops.corpusprep import (
        benchmark_grams,
        decontaminate,
        decontaminate_spans,
    )
    from crawlray.ops.relational import hash_sample

    # bench + candidate sides both derive from this scan — pin it once
    docs = _rd(sf_dir, "documents", columns=["doc_id", "text"]).materialize()
    bench = hash_sample(docs, key="doc_id", buckets_kept=16)
    cand = hash_sample(docs, key="doc_id", buckets_kept=16, invert=True)
    bg = benchmark_grams(bench, n=8)

    def _norm_docs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["doc"] * batch.num_rows, pa.string()),
                "a": pc.cast(batch.column("doc_id"), pa.int64()),
                "b": pc.cast(batch.column("n_hits"), pa.int64()),
                "v": pa.array([""] * batch.num_rows, pa.string()),
            }
        )

    def _norm_spans(batch: pa.Table) -> pa.Table:
        v = pc.binary_join_element_wise(
            pc.cast(batch.column("span_end"), pa.string()),
            pc.cast(batch.column("n_grams"), pa.string()),
            ":",
        )
        return pa.table(
            {
                "kind": pa.array(["span"] * batch.num_rows, pa.string()),
                "a": pc.cast(batch.column("doc_id"), pa.int64()),
                "b": pc.cast(batch.column("span_start"), pa.int64()),
                "v": v,
            }
        )

    flagged = decontaminate(cand, None, n=8, bench_grams=bg).map_batches(
        _norm_docs, batch_format="pyarrow"
    )
    spans = decontaminate_spans(
        cand, None, n=8, bench_grams=bg
    ).map_batches(_norm_spans, batch_format="pyarrow")
    return flagged.union(spans)


def _asof_join(sf_dir: str):
    """Custom temporal operator Ray Data lacks (task brief): distributed
    as-of join — each non-purchase event picks up the latest at-or-before
    purchase by the same user. One groupby(user) shuffle; vectorized
    searchsorted kernel per group."""
    from crawlray.ops.temporal import asof_join

    # two lazy branches each re-execute their read: prune the right
    # branch's read to the 5 columns it touches (left is SELECT l.*).
    left = _rd(sf_dir, "events").filter(expr="event_type != 'purchase'")
    right = (
        _rd(
            sf_dir, "events",
            columns=["user_id", "ts", "event_id", "value", "event_type"],
        )
        .filter(expr="event_type == 'purchase'")
        .select_columns(["user_id", "ts", "event_id", "value"])
    )
    return asof_join(
        left, right, on="ts", by="user_id",
        right_payload=["ts", "event_id", "value"], join_type="inner",
    )


def _range_join(sf_dir: str):
    """Custom temporal operator Ray Data lacks (task brief): interval join
    with NO equi-key — events falling inside 30-minute windows anchored at
    every 97th event. Right intervals replicate to overlapping time
    buckets; left rows land in exactly one bucket, so the bucket equi-join
    emits each qualifying pair exactly once."""
    from crawlray.ops.temporal import range_join

    ev = _rd(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def _anchors(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id")
        keep = pc.equal(
            pc.subtract(eid, pc.multiply(pc.divide(eid, 97), 97)), 0
        )
        b = batch.filter(keep)
        we = pc.add(
            b.column("ts"), pa.scalar(1800_000_000, pa.duration("us"))
        ).cast(pa.timestamp("us"))
        return pa.table(
            {"win_id": b.column("event_id"), "ws": b.column("ts"), "we": we}
        )

    windows = ev.map_batches(_anchors, batch_format="pyarrow")
    return range_join(
        ev.select_columns(["event_id", "ts", "user_id"]), windows,
        left_ts="ts", right_start="ws", right_end="we",
        bucket_width=1800_000_000,
    )


def _samples(sf_dir: str):
    """O-36, all three deterministic samplers in one tagged table (VERDICT
    r3/r4 consolidation). kind='hash': content-keyed ~9.8% sample (25 of
    256 md5-prefix buckets) — reproducible across runs/parallelism/
    engines, unlike Dataset.random_sample. kind='stratified': balanced
    per-source sample, 10 docs per source chosen as the smallest
    md5(doc_id) per group — the 'equal representation per source'
    training-data sampler. kind='weighted': Efraimidis-Spirakis weighted
    sample of 100 orders, inclusion probability ∝ o_totalprice, rows
    normalized to (doc_id=o_orderkey, source='orders') so all the
    samplers share one schema and one driver row. kind='split_<name>':
    deterministic 80/10/10 train/val/test assignment (hash_split —
    exhaustive + disjoint md5-bucket ranges, stable across runs/
    parallelism/engines)."""
    from crawlray.ops.relational import (
        hash_sample,
        md5_digest_col,
        stratified_sample,
        weighted_sample,
    )

    # six arms share this two-column scan — pin it once, WITH the md5
    # digest of doc_id precomputed (md5_digest_col): five arms key on
    # the same digest, and the per-row Python md5 is the only work here
    # that scales with ROWS (at sf0.1 the query is floored by plan
    # overhead — measured old≈new — but at corpus scale one hashing
    # pass instead of five is the dominant CPU term; VERDICT r4 item 6)
    docs = md5_digest_col(
        _rd(sf_dir, "documents", columns=["doc_id", "source"]), "doc_id"
    ).materialize()

    def _tag(kind: str):
        def _m(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "source": batch.column("source"),
                    "kind": pa.array(
                        [kind] * batch.num_rows, pa.string()
                    ),
                }
            )

        return _m

    h = hash_sample(
        docs, key="doc_id", buckets_kept=25, digest_col="_md5"
    ).map_batches(_tag("hash"), batch_format="pyarrow")
    s = stratified_sample(
        docs,
        group_col="source",
        key_col="doc_id",
        n_per_group=10,
        digest_col="_md5",
    ).map_batches(_tag("stratified"), batch_format="pyarrow")

    def _norm_orders(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("o_orderkey"), pa.int64()),
                "source": pa.array(
                    ["orders"] * batch.num_rows, pa.string()
                ),
            }
        )

    w = (
        weighted_sample(
            _rd(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]),
            key_col="o_orderkey",
            weight_col="o_totalprice",
            k=100,
        )
        .map_batches(_norm_orders, batch_format="pyarrow")
        .map_batches(_tag("weighted"), batch_format="pyarrow")
    )

    # kind='mixture': the data-mixing sampler. Each source's keep-rate is
    # derived deterministically from md5(source)'s first hex char
    # (rate = hex·17/256, i.e. threshold 'xx'), so the oracle expresses
    # the identical predicate as REPEAT(SUBSTR(MD5(source),1,1), 2)
    # with zero hardcoded source names.
    import hashlib as _hl

    from crawlray.ops.relational import mixture_sample

    # rates derivation reads ONLY the source column (prune-at-the-read);
    # a production pipeline would know its domain weights up front
    srcs = docs.unique("source")
    rates = {
        s: int(_hl.md5(s.encode("utf-8")).hexdigest()[0], 16) * 17 / 256
        for s in srcs
    }
    m = mixture_sample(
        docs,
        source_col="source",
        key_col="doc_id",
        rates=rates,
        digest_col="_md5",
    ).map_batches(_tag("mixture"), batch_format="pyarrow")

    # kind='split_<name>': deterministic 80/10/10 train/val/test
    # assignment (hash_split) — every doc labeled, kind carries the label
    from crawlray.ops.relational import hash_split

    def _fold_split(batch: pa.Table) -> pa.Table:
        kind = pc.binary_join_element_wise(
            pa.array(["split"] * batch.num_rows, pa.string()),
            batch.column("split"),
            "_",
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "kind": kind,
            }
        )

    sp = hash_split(
        docs,
        key="doc_id",
        splits=[("train", 205), ("val", 25), ("test", 26)],
        digest_col="_md5",
    ).map_batches(_fold_split, batch_format="pyarrow")

    # kind='epoch<k>': fractional-epoch repeat mixing (epoch_mixture) —
    # e_source = 0.5 + hex(md5(source)[0])·0.25 ∈ [0.5, 4.25], so some
    # sources downsample and some repeat 4×; frac(e)·256 is exact
    # (multiples of 64) so the oracle threshold is exact hex
    from crawlray.ops.relational import epoch_mixture

    eps = {
        s: 0.5 + int(_hl.md5(s.encode("utf-8")).hexdigest()[0], 16) * 0.25
        for s in srcs
    }

    def _fold_epoch(batch: pa.Table) -> pa.Table:
        kind = pc.binary_join_element_wise(
            pa.array(["epoch"] * batch.num_rows, pa.string()),
            pc.cast(batch.column("epoch"), pa.string()),
            "",
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "kind": kind,
            }
        )

    ep = epoch_mixture(
        docs,
        source_col="source",
        key_col="doc_id",
        epochs=eps,
        digest_col="_md5",
    ).map_batches(_fold_epoch, batch_format="pyarrow")
    return h.union(s).union(w).union(m).union(sp).union(ep)


def _salted_grouped_topk(sf_dir: str):
    """Skew-salted window-rank top-k (SURVEY §4.3 salted-key splitting):
    top-5 events by value per event_type. Every event_type holds ~20% of
    rows, so `sample_hot_keys` marks ALL keys hot and the full two-phase
    salt path (top-k per (key, salt) → merge survivors) runs; output is
    identical to the unsalted operator / SQL window rank."""
    from crawlray.ops.relational import salted_grouped_topk

    return salted_grouped_topk(
        _rd(sf_dir, "events", columns=["event_id", "event_type", "value"]),
        group_cols=["event_type"], order_col="value", k=5,
        descending=True, tiebreak_col="event_id", num_salts=8,
    )


def _salted_shuffle_join(sf_dir: str):
    """Skew-salted shuffle join: events ⋈ per-type counts on event_type
    (5 keys, each ~20% of rows — maximal skew). Hot-key left rows cycle
    over 8 salts, the right side replicates per salt; result is the exact
    unsalted inner join."""
    from crawlray.ops.relational import salted_shuffle_join

    ev = _rd(sf_dir, "events", columns=["event_id", "event_type"])
    dim = (
        _rd(sf_dir, "events", columns=["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="type_n"))
    )
    out = salted_shuffle_join(ev, dim, on="event_type", num_salts=8)
    return out.select_columns(["event_id", "event_type", "type_n"])


def _paragraph_dedup(sf_dir: str):
    """Corpus-wide exact paragraph dedup (Dolma-style boilerplate
    stripping) over documents with DETERMINISTIC planted boilerplate (the
    synthetic corpus has no repeated paragraphs): every doc gains a
    common header paragraph and a per-source footer paragraph, separated
    by ' | '. The dedup keeps the header once globally (min (doc_id,
    pos)), each footer once per source, and every unique body — the
    oracle rebuilds the identical augmented text and expresses the same
    keep-first window predicate. One hash-bucket shuffle on paragraph
    content; explode and plant are zero-shuffle maps."""
    from crawlray.ops.corpusprep import paragraph_dedup

    def _plant(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "text": pc.binary_join_element_wise(
                    "corpus header all rights reserved",
                    b.column("text"),
                    pc.binary_join_element_wise(
                        "footer of", b.column("source"), " "
                    ),
                    " | ",
                ),
            }
        )

    planted = _rd(
        sf_dir, "documents", columns=["doc_id", "source", "text"]
    ).map_batches(_plant, batch_format="pyarrow")
    return paragraph_dedup(planted, id_col="doc_id", text_col="text")


def _distinct_types(sf_dir: str):
    """O-31: distinct values via groupby shuffle."""
    from crawlray.ops.relational import distinct

    return distinct(_rd(sf_dir, "events", columns=["event_type"]), ["event_type"])


def _union_all(sf_dir: str):
    """O-37: union of two filtered branches (zero-copy block concat)."""
    orders = _rd(sf_dir, "orders")
    a = orders.filter(expr="o_orderstatus == 'O'")
    b = orders.filter(expr="o_orderstatus == 'F'")
    return a.union(b)


def _windowed_agg(sf_dir: str):
    """O-42/§2.9: tumbling AND hopping window aggregates in one tagged
    table (VERDICT r3 item 1 consolidation). Tumbling: events per hour
    (kind='tumbling', window_start = hour epoch-seconds). Hopping: events
    per 1-hour window hopping every 15 minutes, 4 windows/event
    (kind='hopping')."""
    from crawlray.ops.relational import hopping_window_agg

    ev = _rd(sf_dir, "events", columns=["ts", "value"])

    def _bucket(batch: pa.Table) -> pa.Table:
        floor = pc.floor_temporal(batch.column("ts"), unit="hour")
        secs = pc.divide(pc.cast(floor, pa.int64()), 1_000_000)
        return pa.table({"window_start": secs, "value": batch.column("value")})

    tumbling = (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total_value"))
    )
    hopping = hopping_window_agg(
        ev, ts_col="ts", value_col="value", window_seconds=3600, hop_seconds=900
    )

    def _tag(kind: str):
        def _m(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "kind": pa.array([kind] * batch.num_rows, pa.string()),
                    "window_start": pc.cast(
                        batch.column("window_start"), pa.int64()
                    ),
                    "n": batch.column("n"),
                    "total_value": pc.round(
                        batch.column("total_value"), ndigits=3
                    ),
                }
            )

        return _m

    return tumbling.map_batches(_tag("tumbling"), batch_format="pyarrow").union(
        hopping.map_batches(_tag("hopping"), batch_format="pyarrow")
    )


def _json_props(sf_dir: str):
    """O-44: JSON field extraction + aggregate (rides the sketches query
    as kind='json' since the simhash window-packing merge)."""
    from crawlray.ops.textqa import parse_json_field

    ds = parse_json_field(_rd(sf_dir, "events", columns=["props"]), "props", "k", "k")
    return ds.groupby("k").aggregate(Count(alias_name="n"))


def _simhash(sf_dir: str):
    """SimHash, BOTH halves in one tagged table, fully SQL-oracled via
    the md5 hash mode (the production crc32mix kernel is unchanged and
    unit-tested): kind='sig' — per-doc 64-bit signature split as (hi, lo)
    32-bit BIGINT halves (DuckDB BIGINT shifts overflow at bit 63, so the
    oracle never builds the full word); kind='pairs' — banded-bucket
    near-dup pairs with exact in-bucket Hamming verify, COMPLETE for
    hamming <= 3 by the 4×16-bit band pigeonhole, so the approximate
    engine path equals the oracle's exact all-pairs self-join.
    Signatures are computed ONCE and reused by the pair pass."""
    from crawlray.ops.neardup import simhash_dup_pairs, simhash_table

    docs = _rd(sf_dir, "documents", columns=["doc_id", "text"])
    sims = simhash_table(docs, hash_mode="md5").materialize()

    def _sig(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        v = (
            batch.column("simhash")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        return pa.table(
            {
                "kind": pa.array(["sig"] * n),
                "id_a": batch.column("doc_id"),
                "id_b": pa.array([-1] * n, pa.int64()),
                "hi": pa.array((v >> np.uint64(32)).astype(np.int64)),
                "lo": pa.array(
                    (v & np.uint64(0xFFFFFFFF)).astype(np.int64)
                ),
                "hamming": pa.array([-1] * n, pa.int64()),
            }
        )

    pairs = simhash_dup_pairs(docs, sims=sims)
    np_ = pairs.num_rows
    pairs_arm = pa.table(
        {
            "kind": pa.array(["pairs"] * np_),
            "id_a": pairs.column("id_a"),
            "id_b": pairs.column("id_b"),
            "hi": pa.array([0] * np_, pa.int64()),
            "lo": pa.array([0] * np_, pa.int64()),
            "hamming": pairs.column("hamming").cast(pa.int64()),
        }
    )
    sig = sims.map_batches(_sig, batch_format="pyarrow")
    return sig.union(ray.data.from_arrow(pairs_arm))


_BPE_K = 12  # merge rounds in the flatten_tokens bpe arms (engine + oracle)


def _flatten_tokens(sf_dir: str):
    """O-43 analogue + inverted index + PMI collocations + BPE tokenizer
    training in one tagged table. kind='flat' — explode documents into
    (doc_id, token) rows; kind='index' — the inverted index (token →
    df + comma-joined ascending posting list), built with ONE hash
    shuffle of distinct (token, doc) pairs and a fully vectorized
    per-partition list-aggregate kernel; kind='pmi' —
    pointwise-mutual-information collocation mining over adjacent token
    pairs (token='w1 w2', df=corpus bigram count,
    score=ln(TU·c12/(c1·c2)); bigram/unigram tables never driver-held,
    min_count filter before the joins); kind='bpe_merge' — the learned
    BPE merge table (ops/bpe.bpe_train: corpus folded ONCE to a
    word-frequency table, then one vocab-sized exchange per round,
    token='left right', doc_id=rank, df=pair count, postings=merged
    symbol); kind='bpe_vocab' — corpus-wide BPE token counts under
    those rules (K vectorized replace passes + one hash count, doc_id
    sentinel -3). The oracle replays the training as a CTE chain (one
    pair-count/argmax/replace round per rank).
    Schema: (kind, token, doc_id, df, postings, score); arms fill
    unused fields with 0 / '' / -1 / -2 / -3 sentinels."""
    import pyarrow.compute as pc

    from crawlray.ops.bpe import bpe_train, bpe_vocab_counts
    from crawlray.ops.textqa import (
        explode_tokens,
        inverted_index,
        pmi_collocations,
    )

    # five arms consume the same two columns — pin the scan ONCE (block
    # refs in the object store, spillable) instead of five parquet reads;
    # at 100 TB one scan vs five is the dominant IO term
    docs = _rd(sf_dir, "documents", columns=["doc_id", "text"]).materialize()

    def _norm_flat(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "kind": pa.array(["flat"] * n),
                "token": batch.column("token"),
                "doc_id": batch.column("doc_id"),
                "df": pa.array([0] * n, pa.int64()),
                "postings": pa.array([""] * n),
                "score": pa.array([0.0] * n, pa.float64()),
            }
        )

    def _norm_idx(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "kind": pa.array(["index"] * n),
                "token": batch.column("token"),
                "doc_id": pa.array([-1] * n, pa.int64()),
                "df": batch.column("df"),
                "postings": batch.column("postings"),
                "score": pa.array([0.0] * n, pa.float64()),
            }
        )

    def _norm_pmi(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "kind": pa.array(["pmi"] * n),
                "token": pc.binary_join_element_wise(
                    batch.column("w1").cast(pa.string()),
                    batch.column("w2").cast(pa.string()),
                    " ",
                ),
                "doc_id": pa.array([-2] * n, pa.int64()),
                "df": batch.column("c12"),
                "postings": pa.array([""] * n),
                "score": batch.column("pmi"),
            }
        )

    flat = explode_tokens(docs).map_batches(
        _norm_flat, batch_format="pyarrow"
    )
    idx = inverted_index(docs, num_partitions=16).map_batches(
        _norm_idx, batch_format="pyarrow"
    )
    pmi = pmi_collocations(docs, min_count=2).map_batches(
        _norm_pmi, batch_format="pyarrow"
    )

    merges = bpe_train(docs, num_merges=_BPE_K)
    n_m = merges.num_rows
    # The oracle replays exactly _BPE_K merge rounds; a corpus that
    # exhausts merges early would silently diverge (its bb{r} CTEs go
    # empty and the oracle's bpe_vocab arm vanishes while the engine
    # still counts under <K rules). Fail loudly instead (ADVICE r4).
    if n_m != _BPE_K:
        raise RuntimeError(
            f"bpe_train learned {n_m} merges but the oracle replays "
            f"{_BPE_K} rounds — corpus too small/degenerate for parity"
        )
    mt = pa.table(
        {
            "kind": pa.array(["bpe_merge"] * n_m, pa.string()),
            "token": pc.binary_join_element_wise(
                merges.column("left"), merges.column("right"), " "
            ),
            "doc_id": merges.column("rank"),
            "df": merges.column("cnt"),
            "postings": merges.column("merged"),
            "score": pa.array([0.0] * n_m, pa.float64()),
        }
    )

    def _norm_bvoc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return mt.schema.empty_table()
        n = batch.num_rows
        return pa.table(
            {
                "kind": pa.array(["bpe_vocab"] * n),
                "token": batch.column("token"),
                "doc_id": pa.array([-3] * n, pa.int64()),
                "df": batch.column("n"),
                "postings": pa.array([""] * n),
                "score": pa.array([0.0] * n, pa.float64()),
            }
        )

    bvoc = bpe_vocab_counts(docs, merges).map_batches(
        _norm_bvoc, batch_format="pyarrow"
    )
    return (
        flat.union(idx)
        .union(pmi)
        .union(ray.data.from_arrow(mt))
        .union(bvoc)
    )


def _quality_score(sf_dir: str):
    """Quality scoring, BOTH forms in one tagged table: kind='model' —
    logistic scorer as an actor-pool map_batches stage (weights loaded
    once per actor in __init__, vectorized logistic per batch; fixed
    deterministic weights make even the inference SQL-expressible);
    kind='gopher_*' — the Gopher rule signals (token count, mean word
    length, distinct-stopword hits, repetition fractions) plus the
    combined keep verdict, every value an exact integer count or exact
    IEEE division so the oracle matches bit-for-bit; kind='ppl' — the
    CCNet corpus filter: per-token negative log-likelihood under an
    add-½-smoothed bigram LM trained on the src0-src4 slice (distributed
    train + score, ops/textqa.ngram_lm_score) — the micro-units int64
    reduce makes even the distributed float SUM bit-exact vs the SQL
    oracle; kind='dsir' — DSIR importance weights (hashed-bigram
    log(p_target/p_source), target = the same src0-src4 slice; the
    B-bucket histograms broadcast, only the per-doc sum shuffles);
    kind='nb' — fastText-style Naive-Bayes quality classifier (the
    GPT-3/LLaMA CommonCrawl-filter shape): distributed train (pos class
    = the src0-src4 slice) + per-doc log-odds score, the per-token
    weight table joined, never broadcast or driver-held, with the same
    micro-units int64 reduce for bit-exact SQL parity.
    Schema: (doc_id, kind, score)."""
    from crawlray.ops.textqa import (
        dsir_weights,
        gopher_signals,
        nb_quality_score,
        ngram_lm_score,
        quality_score,
    )

    # five arms share one scan: read the 3-column superset once, project
    docs3 = _rd(
        sf_dir, "documents", columns=["doc_id", "text", "source"]
    ).materialize()
    docs = docs3.select_columns(["doc_id", "text"])
    model = quality_score(docs, concurrency=2)
    train = ["src0", "src1", "src2", "src3", "src4"]
    ppl = ngram_lm_score(docs3, train)
    dsir = dsir_weights(docs3, train)
    nb = nb_quality_score(docs3, train)

    def _melt_ppl(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "kind": pa.array(["ppl"] * batch.num_rows),
                "score": batch.column("nll"),
            }
        )

    def _melt_dsir(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "kind": pa.array(["dsir"] * batch.num_rows),
                "score": batch.column("dsir"),
            }
        )

    def _melt_model(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "kind": pa.array(["model"] * batch.num_rows),
                "score": batch.column("quality"),
            }
        )

    def _melt_nb(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "kind": pa.array(["nb"] * batch.num_rows),
                "score": batch.column("nb"),
            }
        )

    sig = gopher_signals(docs)
    arms = [
        ("gopher_n_tokens", "n_tokens"),
        ("gopher_mean_wlen", "mean_wlen"),
        ("gopher_stop_hits", "stop_hits"),
        ("gopher_top_token_frac", "top_token_frac"),
        ("gopher_dup_2gram_frac", "dup_2gram_frac"),
        ("gopher_keep", "keep"),
    ]

    def _melt_sig(batch: pa.Table) -> pa.Table:
        parts = []
        for kind, col in arms:
            parts.append(
                pa.table(
                    {
                        "doc_id": batch.column("doc_id"),
                        "kind": pa.array([kind] * batch.num_rows),
                        "score": pc.cast(batch.column(col), pa.float64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return (
        model.map_batches(_melt_model, batch_format="pyarrow")
        .union(sig.map_batches(_melt_sig, batch_format="pyarrow"))
        .union(ppl.map_batches(_melt_ppl, batch_format="pyarrow"))
        .union(dsir.map_batches(_melt_dsir, batch_format="pyarrow"))
        .union(nb.map_batches(_melt_nb, batch_format="pyarrow"))
    )


def _approx_distinct(sf_dir: str):
    """O-32 HLL approx-distinct, GLOBAL + per-group in one table (VERDICT
    r3 item 1 consolidation), oracled as an error-bound check: each row
    carries the exact distinct user count (engine's own distinct shuffle /
    grouped count) plus a boolean asserting the HLL estimate landed
    within ±2% of it. DuckDB reproduces the exact counts and the bound
    claim (`TRUE`), so a hash match proves the engine's exact distincts
    AND both sketches' accuracy contracts. The global row carries
    event_type='(all)'. (±2% is also unit-asserted across cardinalities
    in tests/unit/test_sketch.py.)"""
    from crawlray.ops.relational import distinct
    from crawlray.ops.sketch import approx_distinct, approx_distinct_by

    ev = _rd(sf_dir, "events", columns=["event_type", "user_id"])
    ests = approx_distinct_by(ev, "event_type", "user_id")
    exact = (
        ev.groupby(["event_type", "user_id"]).count()
        .groupby("event_type").aggregate(Count(alias_name="n_exact"))
    )
    ex = {r["event_type"]: r["n_exact"] for r in exact.take_all()}
    rows = []
    for g, est in zip(
        ests.column("event_type").to_pylist(),
        ests.column("estimate").to_pylist(),
    ):
        rows.append(
            {
                "event_type": g,
                "n_exact": ex[g],
                "hll_within_2pct": abs(est - ex[g]) <= 0.02 * ex[g],
            }
        )
    g_est = approx_distinct(ev, "user_id")
    g_exact = distinct(ev.select_columns(["user_id"]), ["user_id"]).count()
    rows.append(
        {
            "event_type": "(all)",
            "n_exact": g_exact,
            "hll_within_2pct": abs(int(g_est) - g_exact) <= 0.02 * g_exact,
        }
    )
    return pa.Table.from_pylist(sorted(rows, key=lambda r: r["event_type"]))


def _heavy_hitters(sf_dir: str):
    """Misra-Gries frequent-items sketch over events.user_id. With
    k=4096 >= the distinct-user count at driver scales the summary is
    provably exact (zero decrements), so the SQL oracle is a plain GROUP
    BY; the approximate regime (k << distinct) is covered by the
    guarantee tests in tests/unit/test_sketch.py."""
    from crawlray.ops.sketch import frequent_items

    tbl, under = frequent_items(
        _rd(sf_dir, "events", columns=["user_id"]), "user_id", k=4096
    )
    if under != 0:
        # diagnosable failure instead of a bare assert (ADVICE r3): at a
        # larger scale factor the exact-regime precondition (k >= distinct
        # users) breaks and the plain-GROUP-BY oracle no longer applies
        raise RuntimeError(
            f"heavy_hitters oracle precondition violated: Misra-Gries "
            f"undercount={under} at k=4096 — distinct user_id exceeds k, "
            f"so the summary is approximate and the exact SQL oracle "
            f"does not apply at this scale factor"
        )
    return tbl


def _sketches(sf_dir: str):
    """HLL approx-distinct (global + per-group, ±2% bound asserted),
    Misra-Gries heavy hitters AND the O-44 JSON-extraction aggregate in
    one tagged table (window-packing merges that freed slots for
    pack_bins and simhash): kind='hll' rows carry the exact distinct
    user count per event_type with the sketch-accuracy boolean;
    kind='mg' rows carry the frequent-items counts (exact at driver
    scales since k >= distinct users — precondition enforced inside
    _heavy_hitters); kind='json' rows carry per-key counts of the JSON
    `props.k` field; kind='cm' rows probe a distributed Count-Min
    sketch (linear merge: sparse per-block partials + one hash
    exchange) for every distinct user — n is the exact count and
    within_bound asserts the CM point query never undercounts
    (est >= exact, a deterministic CM guarantee the oracle states as
    TRUE). All engine paths run unchanged."""
    from crawlray.ops.sketch import cm_probe, count_min

    hll = _approx_distinct(sf_dir)
    mg = _heavy_hitters(sf_dir)
    js = _json_props(sf_dir).to_pandas()  # per-key counts: tiny final
    jk = pa.array(js["k"].astype(str).tolist(), pa.string())
    jn = pa.array(js["n"].astype("int64").tolist(), pa.int64())
    cm = count_min(_rd(sf_dir, "events", columns=["user_id"]), "user_id")
    cmp_ = (
        cm_probe(
            ray.data.from_arrow(
                pa.table(
                    {
                        "user_id": pc.cast(
                            mg.column("item").combine_chunks(), pa.int64()
                        ),
                        "n_exact": pc.cast(
                            mg.column("est_count").combine_chunks(),
                            pa.int64(),
                        ),
                    }
                )
            ),
            cm,
            "user_id",
        )
        .to_pandas()
        .sort_values("user_id")
    )
    cmk = pa.array(cmp_["user_id"].astype(str).tolist(), pa.string())
    cmn = pa.array(cmp_["n_exact"].astype("int64").tolist(), pa.int64())
    cmb = pa.array(
        (cmp_["cm_est"] >= cmp_["n_exact"]).tolist(), pa.bool_()
    )
    return pa.table(
        {
            "kind": pa.array(
                ["hll"] * hll.num_rows
                + ["mg"] * mg.num_rows
                + ["json"] * len(js)
                + ["cm"] * len(cmp_)
            ),
            "key": pa.concat_arrays(
                [
                    hll.column("event_type").combine_chunks(),
                    pc.cast(
                        mg.column("item").combine_chunks(), pa.string()
                    ),
                    jk,
                    cmk,
                ]
            ),
            "n": pa.concat_arrays(
                [
                    pc.cast(
                        hll.column("n_exact").combine_chunks(), pa.int64()
                    ),
                    pc.cast(
                        mg.column("est_count").combine_chunks(), pa.int64()
                    ),
                    jn,
                    cmn,
                ]
            ),
            "within_bound": pa.concat_arrays(
                [
                    hll.column("hll_within_2pct").combine_chunks(),
                    pa.array([True] * mg.num_rows, pa.bool_()),
                    pa.array([True] * len(js), pa.bool_()),
                    cmb,
                ]
            ),
        }
    )


def _pack_bins(sf_dir: str):
    """Next-fit whole-document bin packing (SFT-style: never splits a
    doc): per source in doc_id order, docs join the open bin while the
    token total stays <= 256, else open a new bin. Distributed via the
    O-33 pattern extended to NON-ADDITIVE greedy state (a bin spans
    block boundaries): per-run compact absorbed-prefix tables, O(#runs)
    driver fold, local vectorized assignment — see
    corpusprep.pack_bins. The oracle walks the same greedy with a
    recursive CTE, one step per document."""
    from crawlray.ops.corpusprep import pack_bins

    return pack_bins(
        _rd(sf_dir, "documents", columns=["source", "doc_id", "text"]),
        budget=256,
    )


def _tfidf(sf_dir: str):
    """TF-IDF + Okapi BM25 per (doc, term): token explode → tf groupby →
    df groupby → term-keyed shuffle join; vocabulary never broadcast or
    driver-held. BM25's doc length `dl` rides map-side through the explode
    (no doc-length join); avgdl is summed off the already-materialized tf
    — so BM25 adds ZERO shuffles to the TF-IDF plan."""
    from crawlray.ops.textqa import tfidf

    return tfidf(
        _rd(sf_dir, "documents", columns=["doc_id", "text"]), bm25=True
    )


def _doc_profile(sf_dir: str):
    """Per-doc profile — the doc_stats, bpe_token_count and fingerprint
    kernels FUSED into one map_batches pass (one read/stream instead of
    three; VERDICT r3 item 1 consolidation). Columns: doc_id, n_chars2,
    n_tokens, n_bpe_tokens (GPT-2-style RE2 pretokenizer count — Arrow
    and DuckDB share the RE2 engine so counts match exactly), fp (md5)."""
    from crawlray.ops.textqa import doc_profile

    return doc_profile(_rd(sf_dir, "documents", columns=["doc_id", "text"]))


def _token_count_by_source(sf_dir: str):
    """Per-source corpus diagnostics (token counting grown into the
    data-mixing pre-flight): doc/token/type counts, type-token ratio and
    unigram Shannon entropy — ops/textqa.corpus_diagnostics: ONE
    (source, token) hash-count exchange + two per-source summary
    exchanges; the entropy sum is int64 micro-units so the distributed
    reduce is exact and bit-identical to the SQL oracle."""
    from crawlray.ops.textqa import corpus_diagnostics

    return corpus_diagnostics(
        _rd(sf_dir, "documents", columns=["source", "text"])
    )




def _exact_dedup_docs(sf_dir: str):
    """Exact near-key dedup: documents by 5-token text prefix, keep min
    doc_id — hash-partitioned keep-first path (one shuffle, VERDICT r3
    item 5)."""
    from crawlray.ops.dedup import dedup_keep_first_hash as dedup_keep_first

    ds = _rd(
        sf_dir, "documents",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )

    def _key(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        key5 = pc.binary_join(pc.list_slice(toks, 0, 5), " ")
        cols = {n: batch.column(n) for n in batch.column_names}
        cols["k5"] = key5
        return pa.table(cols)

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    deduped = dedup_keep_first(keyed, key="k5", order="doc_id")
    return deduped.select_columns(["doc_id", "text", "lang", "source", "n_chars"])


def _knn_ann(sf_dir: str):
    """Similarity search suite in one tagged table (VERDICT r3 item 1
    consolidation): kind='brute' — brute-force cosine top-5 for the first
    10 vectors (broadcast queries, per-block top-k); kind='ivf_assign' —
    IVF nearest-centroid bucket per vector (centroids = first 8
    embeddings, deterministic); kind='ivf_knn' — IVF ANN end-to-end
    (bucketing + nprobe=3 probe search, top-5 per query); kind='cross' —
    cross-dataset similarity join (corpus vs the vec_id%7==0 slice at
    cosine >= 0.45, broadcast-right shape: the "dedup a new batch against
    the corpus" primitive). Columns (kind, id, other): brute/ivf_knn rows
    are (query_id, neighbor_id); ivf_assign rows are (vec_id, bucket);
    cross rows are (left_id, right_id)."""
    import pyarrow.parquet as pq

    from crawlray.ops.knn import (
        cross_similar_join,
        ivf_bucket_assign,
        ivf_search_knn,
        knn_cosine,
    )

    q = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    cent = np.array(
        q.filter(pc.less(q.column("vec_id"), 8)).column("embedding").to_pylist(),
        dtype=np.float64,
    )
    qt = q.filter(pc.less(q.column("vec_id"), 10))
    queries = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)
    qids = np.array(qt.column("vec_id").to_pylist(), dtype=np.int64)

    emb = _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    brute = knn_cosine(emb, queries, qids, k=5)
    assign = ivf_bucket_assign(emb, cent)
    ivf = ivf_search_knn(emb, cent, queries, qids, k=5, nprobe=3)

    def _sect(kind, ids, others):
        return pa.table(
            {
                "kind": pa.array([kind] * len(ids), pa.string()),
                "id": pc.cast(ids, pa.int64()),
                "other": pc.cast(others, pa.int64()),
            }
        )

    # cross-dataset similarity join: right = the vec_id%7==0 slice (small
    # -> broadcast path), left = the full corpus, streaming output
    def _mod7(b: pa.Table) -> pa.Table:
        v = b.column("vec_id")
        return b.filter(
            pc.equal(pc.subtract(v, pc.multiply(pc.divide(v, 7), 7)), 0)
        )

    right = emb.map_batches(_mod7, batch_format="pyarrow")
    cross = cross_similar_join(
        emb, right, threshold=0.45, exclude_equal_ids=True
    )

    # assignment stays a streaming Dataset (one row per corpus vector —
    # never driver-materialized); the small top-k tables ride along
    assign_ds = assign.map_batches(
        lambda b: _sect("ivf_assign", b.column("vec_id"), b.column("bucket")),
        batch_format="pyarrow",
    )
    cross_ds = cross.map_batches(
        lambda b: _sect("cross", b.column("left_id"), b.column("right_id")),
        batch_format="pyarrow",
    )
    small = pa.concat_tables(
        [
            _sect("brute", brute.column("query_id"), brute.column("neighbor_id")),
            _sect("ivf_knn", ivf.column("query_id"), ivf.column("neighbor_id")),
        ]
    )
    return assign_ds.union(cross_ds).union(ray.data.from_arrow(small))






def _ann_sq8(sf_dir: str):
    """SQ8-quantized brute-force kNN (rows-only: approximate by
    quantization error, recall ≥0.9 tested vs exact in
    tests/unit/test_knn_ivf.py). The quantized corpus moves 8x less data
    through plasma/storage per batch — the exact resource the ceiling
    probe shows saturating on this box."""
    import pyarrow.parquet as pq

    from crawlray.ops.knn import sq8_knn, sq8_quantize

    qt = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).slice(0, 10)
    queries = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)
    qids = np.array(qt.column("vec_id").to_pylist(), dtype=np.int64)
    qds = sq8_quantize(_rd(sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    return sq8_knn(qds, queries, qids, k=5).select(["query_id", "neighbor_id"])




def _clean_corpus(sf_dir: str):
    """Flagship LLM-training-data cleaning chain: quality filter (token /
    char bounds) → exact dedup (md5 fingerprint, keep smallest doc_id) →
    per-source corpus stats. Every stage is SQL-expressible, so the whole
    CHAIN is oracled end-to-end."""
    from crawlray.ops.textqa import clean_corpus_stats

    return clean_corpus_stats(
        _rd(sf_dir, "documents", columns=["doc_id", "text", "source"])
    )


def _dedup_clusters(sf_dir: str):
    """Graph analytics over the near-dup graph, one tagged table:
    kind='comp' — exact cosine pairs >= 0.35 over embeddings ->
    connected components via distributed min-label propagation ->
    v = component (smallest member id) — the keep-one-per-cluster dedup
    finale (oracle: DuckDB recursive transitive closure); kind='tri' —
    per-node triangle counts over the SAME edge list (wedge join +
    closing-edge join, ops/graph.triangle_counts) — v = #triangles, the
    local-clustering signal that separates tight dup cliques from
    chain-like false merges (oracle: 3-way self-join); kind='kcore' —
    the 2-core of the SAME graph (ops/graph.kcore distributed peel
    loop: per round one degree exchange + two semi-joins, confluent
    fixpoint) with in-core degrees as v — chains and pendants dissolve,
    dup cliques survive (oracle: fixed MATERIALIZED peel rounds, no-ops
    past the fixpoint). The pair table is computed once and shared."""
    import ray.data as _rdm

    from crawlray.ops.graph import connected_components, kcore, triangle_counts
    from crawlray.ops.knn import similar_pairs_cosine

    pairs = similar_pairs_cosine(
        _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"]), threshold=0.35
    )
    pds = _rdm.from_arrow(pairs)

    def _tag(kind: str, vcol: str):
        def _t(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "kind": pa.array([kind] * n, pa.string()),
                    "node": batch.column("node"),
                    "v": pc.cast(batch.column(vcol), pa.int64()),
                }
            )

        return _t

    comp = connected_components(pds).map_batches(
        _tag("comp", "component"), batch_format="pyarrow"
    )
    tri = triangle_counts(pds).map_batches(
        _tag("tri", "n_tri"), batch_format="pyarrow"
    )
    # max_rounds=10 keeps the engine's peel bound COUPLED to the oracle's
    # R=10 fixed replay rounds (_dedup_clusters_oracle): a graph needing
    # more rounds now raises loudly in the engine instead of producing a
    # confusing parity mismatch against the oracle's non-fixpoint degrees
    # (ADVICE r4).
    kc = kcore(pds, k=2, max_rounds=10).map_batches(
        _tag("kcore", "deg"), batch_format="pyarrow"
    )
    return comp.union(tri).union(kc)


def _embedding_srp_dedup(sf_dir: str):
    """Embedding near-dup pairs via signed-random-projection LSH — the
    sub-quadratic scale path (O(n·bits·dim) + candidate volume, vs the
    exact op's O(n²·dim)). Emitted pairs are EXACTLY verified (f64
    cosine), so precision is always 1.0; recall depends on (n_bits,
    bands). At 128 bits / 32 bands the candidate stage is deterministic
    (fixed seed) and covers every true pair at BOTH gate corpora
    (verified recall 1.0 at sf0.001 and sf0.01; per-pair analytic recall
    at θ = acos(0.45) is 1-(1-0.823⁴)³² ≈ 0.998), so the same SQL oracle
    as `embedding_dedup` applies; on other corpora the op is approximate
    by design (recall tests in tests/unit/test_knn_ivf.py)."""
    from crawlray.ops.knn import srp_pairs_cosine

    out = srp_pairs_cosine(
        _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        threshold=0.45, n_bits=128, bands=32, seed=7,
    )
    return out.select(["id_a", "id_b"])


def _dup_spans(sf_dir: str):
    """Corpus-level exact substring dedup (Lee et al.) — BOTH halves in
    one tagged table so each keeps a driver row inside the 50-entry
    window. kind='span': maximal token spans covered by word 5-grams
    occurring >= 2 times anywhere in the corpus, as (a=doc_id,
    b=span_start, v='span_end:n_dup_grams'). kind='clean': the corpus
    with every covered token CUT, as (a=doc_id, b=n_removed,
    v=text_clean). Oracle: positional gram explode + HAVING COUNT >= 2,
    then a gaps-and-islands window merge (spans) and an anti-join token
    filter + ordered string_agg (clean)."""
    from crawlray.ops.corpusprep import (
        dup_gram_hits,
        dup_spans,
        remove_dup_spans,
    )

    # both halves re-derive token streams from docs — pin the scan once
    docs = _rd(sf_dir, "documents", columns=["doc_id", "text"]).materialize()
    # ONE gram-count exchange + bloom probe feeds both halves
    hits = dup_gram_hits(docs, "doc_id", "text", n=5, min_count=2)
    hits = hits.materialize()

    def _norm_spans(batch: pa.Table) -> pa.Table:
        v = pc.binary_join_element_wise(
            pc.cast(batch.column("span_end"), pa.string()),
            pc.cast(batch.column("n_dup_grams"), pa.string()),
            ":",
        )
        return pa.table(
            {
                "kind": pa.array(["span"] * batch.num_rows, pa.string()),
                "a": pc.cast(batch.column("doc_id"), pa.int64()),
                "b": pc.cast(batch.column("span_start"), pa.int64()),
                "v": v,
            }
        )

    def _norm_clean(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["clean"] * batch.num_rows, pa.string()),
                "a": pc.cast(batch.column("doc_id"), pa.int64()),
                "b": pc.cast(batch.column("n_removed"), pa.int64()),
                "v": batch.column("text_clean"),
            }
        )

    spans = dup_spans(docs, n=5, hits=hits).map_batches(
        _norm_spans, batch_format="pyarrow"
    )
    clean = remove_dup_spans(docs, n=5, hits=hits).map_batches(
        _norm_clean, batch_format="pyarrow"
    )
    return spans.union(clean)


def _lang_cte() -> str:
    """CTE fragment computing (doc_id, lang_pred, lang_score) — the DuckDB
    rendering of the stopword-overlap argmax (first-max tie order
    en/de/fr/es) that `crawlray.ops.textqa.lang_arrays` computes. Spliced
    into the fused doc_profile oracle."""
    from crawlray.ops.textqa import _STOPWORDS

    def lst(lang: str) -> str:
        return "[" + ",".join(f"'{w}'" for w in sorted(_STOPWORDS[lang])) + "]"

    return f"""
        ltoks AS (
          SELECT doc_id,
                 list_distinct(list_filter(
                     string_split_regex(lower(text), '\\s+'),
                     x -> x <> '')[1:200]) AS ltk
          FROM documents
        ), lsc AS (
          SELECT doc_id,
                 len(list_intersect(ltk, {lst('en')})) AS s_en,
                 len(list_intersect(ltk, {lst('de')})) AS s_de,
                 len(list_intersect(ltk, {lst('fr')})) AS s_fr,
                 len(list_intersect(ltk, {lst('es')})) AS s_es
          FROM ltoks
        ), lang AS (
          SELECT doc_id,
               CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr
                         AND s_en >= s_es THEN 'en'
                    WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es THEN 'de'
                    WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
                    WHEN s_es > 0 THEN 'es'
                    ELSE 'und' END AS lang_pred,
               CAST(GREATEST(s_en, s_de, s_fr, s_es) AS BIGINT) AS lang_score
          FROM lsc
        )
    """


def _minhash_signatures(sf_dir: str):
    """MinHash — the WHOLE fuzzy-dedup chain in one tagged, fully
    SQL-oracled table (md5 hash mode; the vectorized crc32mix production
    mode is unchanged and unit-tested — same dual-path convention as
    weighted_sample): kind='sig' — per-doc 16-perm signatures (seed-7
    universal permutations a·x+b mod 2^61−1, inlined in the oracle as
    HUGEINT arithmetic), emitted LONG so the driver's value-hash sees
    scalars; kind='pair' — banded LSH candidates (4 bands × 4 rows,
    complete vs the oracle's band-fingerprint self-join) verified by
    exact hashed-shingle Jaccard ≥ 0.35; kind='keep' — connected
    components over the verified pairs, keep the smallest id per dup
    cluster (oracle: recursive-CTE closure + EXCEPT), i.e. the surviving
    corpus ids. Signatures and pairs are each computed ONCE and shared
    across arms (pairs feed fuzzy_dedup_keep via its pairs= input)."""
    from crawlray.ops.dedup import fuzzy_dedup_keep
    from crawlray.ops.neardup import minhash_lsh_pairs, minhash_signatures

    docs = _rd(
        sf_dir, "documents", columns=["doc_id", "text"]
    ).materialize()
    sigs = minhash_signatures(docs, num_perm=16, hash_mode="md5")

    def _explode(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        flat = batch.column("sig").combine_chunks().flatten()
        return pa.table(
            {
                "kind": pa.array(["sig"] * (n * 16)),
                "doc_id": batch.column("doc_id").take(
                    pa.array(
                        np.repeat(np.arange(n, dtype=np.int64), 16), pa.int64()
                    )
                ),
                "other": pa.array([-1] * (n * 16), pa.int64()),
                "perm": pa.array(
                    np.tile(np.arange(16, dtype=np.int64), n), pa.int64()
                ),
                "minhash": pc.cast(flat, pa.int64()),
                "jaccard": pa.array([0.0] * (n * 16), pa.float64()),
            }
        )

    sig_arm = sigs.map_batches(_explode, batch_format="pyarrow")

    pairs = minhash_lsh_pairs(
        docs, num_perm=16, bands=4, jaccard_threshold=0.35, hash_mode="md5"
    )
    npair = pairs.num_rows
    pair_arm = pa.table(
        {
            "kind": pa.array(["pair"] * npair),
            "doc_id": pairs.column("id_a"),
            "other": pairs.column("id_b"),
            "perm": pa.array([-1] * npair, pa.int64()),
            "minhash": pa.array([-1] * npair, pa.int64()),
            "jaccard": pairs.column("jaccard"),
        }
    )

    def _keep_tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "kind": pa.array(["keep"] * n),
                "doc_id": batch.column("doc_id"),
                "other": pa.array([-1] * n, pa.int64()),
                "perm": pa.array([-1] * n, pa.int64()),
                "minhash": pa.array([-1] * n, pa.int64()),
                "jaccard": pa.array([0.0] * n, pa.float64()),
            }
        )

    keep_arm = (
        fuzzy_dedup_keep(docs, pairs=pairs)
        .select_columns(["doc_id"])
        .map_batches(_keep_tag, batch_format="pyarrow")
    )
    return (
        sig_arm.union(ray.data.from_arrow(pair_arm)).union(keep_arm)
    )


def _ivf_pairs(sf_dir: str):
    """Sub-quadratic embedding near-dup (rows-only): IVF-bucketed
    same-bucket cosine pairs — the approximate scale path whose recall vs
    the exact `embedding_dedup` is asserted in tests/unit/test_knn_ivf.py."""
    import pyarrow.parquet as pq

    from crawlray.ops.knn import ivf_pairs_cosine

    q = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    cent = np.array(
        q.filter(pc.less(q.column("vec_id"), 8)).column("embedding").to_pylist(),
        dtype=np.float64,
    )
    return ivf_pairs_cosine(
        _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"]), cent, threshold=0.45
    )


def _semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic dedup (rows-only): spherical-k-means
    clusters -> within-cluster greedy keep-first-by-id at cosine >= 0.45
    (the same threshold the exact embedding ops use, so the gate corpora
    actually exercise drops). One row per vector: (vec_id, keep, rep_id).
    Exact-greedy parity vs a naive reference, planted-dup removal, and
    parallelism invariance (incl. trained centroids) are asserted in
    tests/unit/test_semantic_dedup.py."""
    from crawlray.ops.knn import semantic_dedup

    return semantic_dedup(
        _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        centroids="train", threshold=0.45, n_centroids=8,
    )


def _ann_ivf_trained(sf_dir: str):
    """IVF bucket assignment with TRAINED centroids (rows-only: k-means
    output has no SQL equivalent; recall-vs-naive-seed asserted in
    tests/unit/test_knn_ivf.py). Exercises the distributed sampled
    k-means++ + Lloyd training path end-to-end."""
    from crawlray.ops.knn import ivf_bucket_assign

    out = ivf_bucket_assign(
        _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"]), "train", n_centroids=8
    )
    return out.select_columns(["vec_id", "bucket"])


def _media_pipeline(sf_dir: str):
    """Multimodal pipeline, all four kernels in one wide result (VERDICT
    r3 item 1 consolidation: media_decode + media_audio + media_resize +
    media_frames merged) — computed by ONE fused actor-pool pass
    (crawlray.ops.media.MediaProfileStage): image decode (REAL
    PNG/GIF/JPEG header parse when magic bytes match — tested on real
    bytes in tests/unit/test_media.py; these text-derived payloads take
    the deterministic, SQL-expressible stub path), resize (integer
    fit-to-max_dim contract), audio decode (REAL WAV/RIFF header parse,
    stub for non-audio), frame-sample aggregate in closed form (n sampled
    frames + summed demuxer seek offsets). One row per document, zero
    joins/shuffles — every column is a pure per-doc function of the
    payload, so the three-branch + two-join composition this replaces
    bought nothing but two exchanges (and deadlocked the 4-CPU test
    cluster's resource scheduler)."""
    from crawlray.ops.media import media_profile

    docs = _rd(sf_dir, "documents", columns=["doc_id", "text"])
    return media_profile(docs, "doc_id", "text", max_dim=256, stride=2)


def _ngram_jaccard(sf_dir: str):
    """Exact all-pairs 3-gram Jaccard ≥ 0.5 — the brute-force counterpart
    of minhash_lsh_dedup (string shingles: no hash-collision caveat, so the
    DuckDB oracle reproduces it verbatim)."""
    from crawlray.ops.neardup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _rd(sf_dir, "documents", columns=["doc_id", "text"]), threshold=0.5
    )


def _cdc(sf_dir: str):
    """CDC chunking AND partial-dup pairs in one tagged table (round-4
    consolidation so both keep a driver row inside the 50-entry window).
    kind='chunk': every content-defined chunk as (a=doc_id, b=chunk_idx,
    v='off:len:fp'). kind='pair': partial-dup doc pairs sharing >= 3
    chunk fingerprints as (a=id_a, b=id_b, v=shared_chunks). The full
    rolling-hash boundary walk is SQL-oracled (recursive CTE); the
    vectorized kernel is additionally parity-tested against a
    byte-at-a-time reference in tests/unit/test_cdc.py."""
    from crawlray.ops.neardup import cdc_dup_pairs
    from crawlray.ops.textqa import cdc_chunks

    docs = _rd(sf_dir, "documents", columns=["doc_id", "text"])

    def _norm_chunks(batch: pa.Table) -> pa.Table:
        v = pc.binary_join_element_wise(
            pc.cast(batch.column("chunk_off"), pa.string()),
            pc.cast(batch.column("chunk_len"), pa.string()),
            pc.cast(batch.column("chunk_fp"), pa.string()),
            ":",
        )
        return pa.table(
            {
                "kind": pa.array(["chunk"] * batch.num_rows, pa.string()),
                "a": pc.cast(batch.column("doc_id"), pa.int64()),
                "b": pc.cast(batch.column("chunk_idx"), pa.int64()),
                "v": v,
            }
        )

    def _norm_pairs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["pair"] * batch.num_rows, pa.string()),
                "a": pc.cast(batch.column("id_a"), pa.int64()),
                "b": pc.cast(batch.column("id_b"), pa.int64()),
                "v": pc.cast(batch.column("shared_chunks"), pa.string()),
            }
        )

    chunks = cdc_chunks(docs).map_batches(
        _norm_chunks, batch_format="pyarrow"
    )
    # cdc_dup_pairs returns a (small) driver-side Arrow pair table
    pairs = ray.data.from_arrow(
        _norm_pairs(cdc_dup_pairs(docs, min_shared=3))
    )
    return chunks.union(pairs)




def _srp_cross_dedup(sf_dir: str):
    """Large×large cross-dataset near-dup via SRP-LSH (rows-only): corpus
    vs the vec_id%7==0 slice at cosine >= 0.45 — the sub-quadratic scale
    path of knn_ann's kind='cross' arm (same pair semantics, LSH-bucketed
    instead of exact block-pair; precision 1.0 by exact verify, recall
    tested vs the exact join in tests/unit/test_knn_ivf.py)."""
    from crawlray.ops.knn import srp_cross_join

    emb = _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _mod7(b: pa.Table) -> pa.Table:
        v = b.column("vec_id")
        return b.filter(
            pc.equal(pc.subtract(v, pc.multiply(pc.divide(v, 7), 7)), 0)
        )

    right = emb.map_batches(_mod7, batch_format="pyarrow")
    out = srp_cross_join(emb, right, threshold=0.45, n_bits=128, bands=32)
    return out.select(["left_id", "right_id"])


def _corpus_semantic_dedup(sf_dir: str):
    """Flagship text -> embed -> semantic-dedup chain (rows-only):
    feature-hash document embeddings (ops/textqa.embed_documents — the
    hashing trick, so exact text dups get cosine-1 vectors) into
    SemDeDup-style cluster dedup (ops/knn.semantic_dedup). One row per
    document: (doc_id, keep, rep_id). Both stages parity-tested
    (tests/unit/test_embed.py, test_semantic_dedup.py), incl. the chain's
    planted-text-dup removal."""
    from crawlray.ops.knn import semantic_dedup
    from crawlray.ops.textqa import embed_documents

    emb = embed_documents(
        _rd(sf_dir, "documents", columns=["doc_id", "text"]), dim=64
    )
    return semantic_dedup(
        emb, centroids="train", threshold=0.9, id_col="doc_id", n_centroids=8
    )


def _crawl_smoke(sf_dir: str):
    """End-to-end distributed crawl on a deterministic synthetic web sized
    from the documents table (rows-only; bit-for-bit oracle equality is
    asserted in tests/conformance)."""
    from crawlray.job import run_crawl
    from crawlray.synthgraph import SynthWeb

    n = _rd(sf_dir, "documents", columns=["doc_id"]).count()
    web = SynthWeb(seed=42, shape="zipf_hosts", n_urls=max(60, min(n, 2000)), n_hosts=10)
    res = run_crawl(
        web.default_seeds(), web=web, budget_per_host=5, fetch_concurrency=2
    )
    out = res.crawl_log_table()
    res.shutdown()
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDER MATTERS: the driver's correctness harness runs the FIRST 50
    # entries. All 50 SQL-oracled queries come first (VERDICT r3 item 1 —
    # near-duplicate entries were merged into tagged multi-part results
    # [samples, set_ops, windowed_agg, quantiles, knn_ann, approx_distinct,
    # doc_profile, media_pipeline, cdc, pivot_unpivot, session_windows] so
    # the whole oracled surface fits the window); the 7 rows-only queries
    # (pytest-parity instead of SQL: k-means training / Gaussian
    # hyperplanes / the live crawl have no DuckDB counterpart) follow.
    return {
        # -- relational core ------------------------------------------
        "q1_agg": _q1_agg,
        "groupby_counts": _groupby_counts,
        "global_agg": _global_agg,
        "dedup_first": _dedup_first,
        "global_sort_topk": _global_sort_topk,
        "hash_join": _hash_join,
        "join_agg": _join_agg,
        "shuffle_join": _shuffle_join,
        "left_outer_join": _left_outer_join,
        "anti_join": _anti_join,
        "bloom_semi_join": _bloom_semi_join,
        "set_ops": _set_ops,
        "distinct_types": _distinct_types,
        "union_all": _union_all,
        "pivot_unpivot": _pivot_unpivot,
        "rollup": _rollup,
        # -- windows / temporal ---------------------------------------
        "window_functions": _window_functions,
        "group_rank": _group_rank,
        "grouped_topk": _grouped_topk,
        "session_windows": _session_windows,
        "windowed_agg": _windowed_agg,
        "asof_join": _asof_join,
        "range_join": _range_join,
        # -- skew-salted variants --------------------------------------
        "salted_grouped_topk": _salted_grouped_topk,
        "salted_shuffle_join": _salted_shuffle_join,
        # -- sampling / quantiles / sketches ---------------------------
        "samples": _samples,
        "quantiles": _quantiles,
        "sketches": _sketches,
        "minhash_signatures": _minhash_signatures,
        # -- text / LLM-data pipeline ----------------------------------
        # (json_props rides sketches as kind='json' since the simhash
        # window-packing merge)
        "simhash": _simhash,
        "flatten_tokens": _flatten_tokens,
        "tfidf": _tfidf,
        "quality_score": _quality_score,
        "doc_profile": _doc_profile,
        "token_count_by_source": _token_count_by_source,
        "dup_spans": _dup_spans,
        "exact_dedup_docs": _exact_dedup_docs,
        "clean_corpus": _clean_corpus,
        "ngram_jaccard": _ngram_jaccard,
        "cdc": _cdc,
        "pack_sequences": _pack_sequences,
        "pack_bins": _pack_bins,
        "decontaminate": _decontaminate,
        "redact_pii": _redact_pii,
        "paragraph_dedup": _paragraph_dedup,
        # -- embeddings / similarity / graph ---------------------------
        "knn_ann": _knn_ann,
        "embedding_srp_dedup": _embedding_srp_dedup,
        "dedup_clusters": _dedup_clusters,
        "pagerank": _pagerank,
        # -- multimodal -------------------------------------------------
        "media_pipeline": _media_pipeline,
        # ================ rows-only (pytest parity) below ==============
        "ann_sq8": _ann_sq8,
        "ann_ivf_trained": _ann_ivf_trained,
        "ivf_pairs": _ivf_pairs,
        "semantic_dedup": _semantic_dedup,
        "corpus_semantic_dedup": _corpus_semantic_dedup,
        "srp_cross_dedup": _srp_cross_dedup,
        "crawl_smoke": _crawl_smoke,
    }


def _flatten_tokens_oracle() -> str:
    """flatten_tokens oracle, generated: the flat/index/pmi arms are
    static SQL; the BPE training arms replay ops/bpe.bpe_train as a CTE
    chain — per rank r: pair counts over the wrapped word-freq table
    (bp{r}), the argmax with the wrapped tie-break (bb{r}, ORDER BY cnt
    DESC, w1, w2 LIMIT 1), and one literal replace producing the next
    word table (bw{r+1}); bseg applies all K rules to the cleaned
    corpus as nested replaces for the vocab-count arm. The pipe-wrapped
    symbol encoding ('|h| |e| |l| |l| |o|') is what makes one
    non-overlapping replace equal the greedy BPE merge in both engines
    (see crawlray/ops/bpe.py)."""
    K = _BPE_K
    ctes = [
        """
            WITH pairs AS (
                SELECT DISTINCT doc_id, token FROM (
                    SELECT doc_id, UNNEST(str_split(text, ' ')) AS token
                    FROM documents
                )
            ),
            toksall AS (SELECT doc_id, str_split(text, ' ') AS t
                        FROM documents),
            uni AS (
                SELECT w, COUNT(*) AS c
                FROM (SELECT UNNEST(t) AS w FROM toksall) GROUP BY w
            ),
            big AS (
                SELECT t[i] AS w1, t[i+1] AS w2, COUNT(*) AS c12
                FROM toksall,
                     UNNEST(range(1, GREATEST(LEN(t)-1, 0)+1)) u(i)
                GROUP BY w1, w2 HAVING COUNT(*) >= 2
            ),
            tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS tu FROM uni),
            bwf AS (
                SELECT token, COUNT(*) AS freq
                FROM (SELECT UNNEST(str_split(text, ' ')) AS token
                      FROM documents)
                WHERE regexp_matches(token, '^[a-z]+$')
                GROUP BY token),
            bw0 AS MATERIALIZED (
                SELECT rtrim(regexp_replace(token, '(.)', '|\\1| ',
                                            'g')) AS sym, freq
                FROM bwf)"""
    ]
    for r in range(K):
        ctes.append(
            f""",
            bp{r} AS MATERIALIZED (
                SELECT t[i] AS w1, t[i+1] AS w2,
                       CAST(SUM(freq) AS BIGINT) AS cnt
                FROM (SELECT str_split(sym, ' ') AS t, freq FROM bw{r}),
                     UNNEST(range(1, len(t))) u(i)
                GROUP BY w1, w2),
            bb{r} AS MATERIALIZED (
                SELECT w1, w2, cnt, w1 || ' ' || w2 AS pat,
                       '|' || trim(w1, '|') || trim(w2, '|') || '|' AS rep
                FROM bp{r} ORDER BY cnt DESC, w1, w2 LIMIT 1),
            bw{r + 1} AS MATERIALIZED (
                SELECT replace(bw{r}.sym, bb{r}.pat, bb{r}.rep) AS sym,
                       freq
                FROM bw{r}, bb{r})"""
        )
    nested = "base.sym"
    for r in range(K):
        nested = f"replace({nested}, bb{r}.pat, bb{r}.rep)"
    crossjoins = ", ".join(f"bb{r}" for r in range(K))
    ctes.append(
        f""",
            bseg AS (
                SELECT {nested} AS sym
                FROM (SELECT rtrim(regexp_replace(regexp_replace(
                          lower(text), '[^a-z ]', '', 'g'),
                          '(.)', '|\\1| ', 'g')) AS sym
                      FROM documents) base, {crossjoins})"""
    )
    arms = [
        """
            SELECT 'flat' AS kind, token, doc_id,
                   CAST(0 AS BIGINT) AS df, '' AS postings,
                   CAST(0 AS DOUBLE) AS score
            FROM (SELECT doc_id, UNNEST(str_split(text, ' ')) AS token
                  FROM documents)
            UNION ALL
            SELECT 'index', token, CAST(-1 AS BIGINT),
                   COUNT(*),
                   STRING_AGG(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id),
                   CAST(0 AS DOUBLE)
            FROM pairs GROUP BY token
            UNION ALL
            SELECT 'pmi', big.w1 || ' ' || big.w2, CAST(-2 AS BIGINT),
                   big.c12, '',
                   ROUND(LN((s.tu * CAST(big.c12 AS DOUBLE))
                            / (CAST(u1.c AS DOUBLE)
                               * CAST(u2.c AS DOUBLE))), 6)
            FROM big
            JOIN uni u1 ON u1.w = big.w1
            JOIN uni u2 ON u2.w = big.w2, tot s"""
    ]
    for r in range(K):
        arms.append(
            f"""
            UNION ALL
            SELECT 'bpe_merge',
                   trim(w1, '|') || ' ' || trim(w2, '|'),
                   CAST({r} AS BIGINT), cnt,
                   trim(w1, '|') || trim(w2, '|'), CAST(0 AS DOUBLE)
            FROM bb{r}"""
        )
    arms.append(
        """
            UNION ALL
            SELECT 'bpe_vocab', token, CAST(-3 AS BIGINT), n, '',
                   CAST(0 AS DOUBLE)
            FROM (SELECT trim(tk, '|') AS token, COUNT(*) AS n
                  FROM (SELECT UNNEST(str_split(sym, ' ')) AS tk
                        FROM bseg)
                  WHERE trim(tk, '|') <> ''
                  GROUP BY trim(tk, '|'))"""
    )
    return "".join(ctes) + "".join(arms)


def _dedup_clusters_oracle() -> str:
    """dedup_clusters oracle, generated: comp (recursive closure) and
    tri (3-way self-join) are static; the kcore arm replays the peel
    loop as R fixed MATERIALIZED rounds (degree count, alive filter,
    two-sided edge restriction) — peeling is confluent and rounds past
    the fixpoint are no-ops, so any engine fixpoint reached within R is
    bit-identical. R=10 comfortably covers near-dup graphs (typical
    fixpoint: 2-4 rounds; the engine raises if it ever needs more than
    its own max_rounds=16)."""
    R = 10
    parts = [
        """
            WITH RECURSIVE p AS (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
                WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
            ),
            reach(u, v) AS (
                SELECT u, v FROM p
                UNION
                SELECT r.u, p.v FROM reach r JOIN p ON r.v = p.u
            ),
            p2 AS (SELECT u, v FROM p WHERE u < v),
            tri AS (
                SELECT e1.u AS a, e1.v AS b, e2.v AS c
                FROM p2 e1
                JOIN p2 e2 ON e1.v = e2.u
                JOIN p2 e3 ON e3.u = e1.u AND e3.v = e2.v
            ),
            ke0 AS MATERIALIZED (SELECT u AS s, v AS d FROM p)"""
    ]
    for r in range(R):
        parts.append(
            f""",
            kd{r} AS MATERIALIZED (
                SELECT s, COUNT(*) AS dg FROM ke{r} GROUP BY s),
            ka{r} AS MATERIALIZED (
                SELECT s FROM kd{r} WHERE dg >= 2),
            ke{r + 1} AS MATERIALIZED (
                SELECT e.s, e.d FROM ke{r} e
                JOIN ka{r} x ON e.s = x.s
                JOIN ka{r} y ON e.d = y.s)"""
        )
    parts.append(
        f"""
            SELECT 'comp' AS kind, u AS node,
                   LEAST(u, MIN(v)) AS v
            FROM reach GROUP BY u
            UNION ALL
            SELECT 'tri', node, COUNT(*)
            FROM tri t, UNNEST([t.a, t.b, t.c]) AS un(node)
            GROUP BY node
            UNION ALL
            SELECT 'kcore', s, COUNT(*) FROM ke{R} GROUP BY s"""
    )
    return "".join(parts)


def oracle_sql() -> dict[str, str]:
    return {
        "q1_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "groupby_counts": """
            SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 3) AS total_value
            FROM events GROUP BY event_type
        """,
        "global_agg": """
            SELECT COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty,
                   MAX(l_extendedprice) AS max_price, MIN(l_discount) AS min_disc,
                   ROUND(AVG(l_extendedprice), 4) AS avg_price,
                   ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std_price,
                   ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price
            FROM lineitem
        """,
        "dedup_first": """
            SELECT * FROM events
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) = 1
        """,
        "global_sort_topk": """
            SELECT * FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
        """,
        "hash_join": """
            SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "join_agg": """
            SELECT c.c_mktsegment,
                   ROUND(SUM(o.o_totalprice), 2) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "shuffle_join": """
            SELECT l.l_orderkey, l.l_quantity, l.l_extendedprice,
                   o.o_orderstatus, o.o_totalprice
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        """,
        "left_outer_join": """
            WITH f AS (SELECT * FROM orders WHERE o_orderstatus = 'F')
            SELECT 'left' AS kind, c.c_custkey, c.c_mktsegment,
                   COALESCE(o.o_orderkey, -1) AS o_orderkey,
                   COALESCE(o.o_totalprice, -1.0) AS o_totalprice
            FROM customer c
            LEFT JOIN f o ON c.c_custkey = o.o_custkey
            UNION ALL
            SELECT 'full' AS kind,
                   COALESCE(c.c_custkey, o.o_custkey) AS c_custkey,
                   COALESCE(c.c_mktsegment, '(none)') AS c_mktsegment,
                   COALESCE(o.o_orderkey, -1) AS o_orderkey,
                   COALESCE(o.o_totalprice, -1.0) AS o_totalprice
            FROM (SELECT * FROM customer
                  WHERE c_mktsegment = 'BUILDING') c
            FULL JOIN f o ON c.c_custkey = o.o_custkey
        """,
        "pagerank": """
            WITH e AS (
                SELECT DISTINCT l_partkey % 211 AS src, l_suppkey % 211 AS dst
                FROM lineitem WHERE l_partkey % 211 <> l_suppkey % 211
            ),
            nodes AS (
                SELECT DISTINCT node FROM
                    (SELECT src AS node FROM e UNION SELECT dst FROM e)
            ),
            deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY src),
            nd AS (
                SELECT n.node, COALESCE(d.outdeg, 0) AS outdeg
                FROM nodes n LEFT JOIN deg d USING (node)
            ),
            nn AS (SELECT COUNT(*) AS n FROM nodes),
            r0 AS (
                SELECT node, outdeg, 1.0 / (SELECT n FROM nn) AS rank FROM nd
            ),
            r1 AS (
                SELECT nd.node, nd.outdeg,
                       0.15 / (SELECT n FROM nn)
                       + 0.85 * (COALESCE(s.in_sum, 0)
                                 + (SELECT COALESCE(SUM(rank), 0) FROM r0
                                    WHERE outdeg = 0) / (SELECT n FROM nn))
                       AS rank
                FROM nd
                LEFT JOIN (
                    SELECT e.dst AS node, SUM(p.rank / p.outdeg) AS in_sum
                    FROM e JOIN r0 p ON e.src = p.node GROUP BY e.dst
                ) s USING (node)
            ),
            r2 AS (
                SELECT nd.node, nd.outdeg,
                       0.15 / (SELECT n FROM nn)
                       + 0.85 * (COALESCE(s.in_sum, 0)
                                 + (SELECT COALESCE(SUM(rank), 0) FROM r1
                                    WHERE outdeg = 0) / (SELECT n FROM nn))
                       AS rank
                FROM nd
                LEFT JOIN (
                    SELECT e.dst AS node, SUM(p.rank / p.outdeg) AS in_sum
                    FROM e JOIN r1 p ON e.src = p.node GROUP BY e.dst
                ) s USING (node)
            ),
            r3 AS (
                SELECT nd.node, nd.outdeg,
                       0.15 / (SELECT n FROM nn)
                       + 0.85 * (COALESCE(s.in_sum, 0)
                                 + (SELECT COALESCE(SUM(rank), 0) FROM r2
                                    WHERE outdeg = 0) / (SELECT n FROM nn))
                       AS rank
                FROM nd
                LEFT JOIN (
                    SELECT e.dst AS node, SUM(p.rank / p.outdeg) AS in_sum
                    FROM e JOIN r2 p ON e.src = p.node GROUP BY e.dst
                ) s USING (node)
            ),
            r4 AS (
                SELECT nd.node, nd.outdeg,
                       0.15 / (SELECT n FROM nn)
                       + 0.85 * (COALESCE(s.in_sum, 0)
                                 + (SELECT COALESCE(SUM(rank), 0) FROM r3
                                    WHERE outdeg = 0) / (SELECT n FROM nn))
                       AS rank
                FROM nd
                LEFT JOIN (
                    SELECT e.dst AS node, SUM(p.rank / p.outdeg) AS in_sum
                    FROM e JOIN r3 p ON e.src = p.node GROUP BY e.dst
                ) s USING (node)
            ),
            hh0 AS MATERIALIZED (SELECT node, 1 AS h FROM nodes),
            ha1 AS MATERIALIZED (
                SELECT e.dst AS node, SUM(hh0.h) AS a FROM e
                JOIN hh0 ON e.src = hh0.node GROUP BY e.dst),
            hh1 AS MATERIALIZED (
                SELECT e.src AS node, SUM(ha1.a) AS h FROM e
                JOIN ha1 ON e.dst = ha1.node GROUP BY e.src),
            ha2 AS MATERIALIZED (
                SELECT e.dst AS node, SUM(hh1.h) AS a FROM e
                JOIN hh1 ON e.src = hh1.node GROUP BY e.dst),
            hh2 AS MATERIALIZED (
                SELECT e.src AS node, SUM(ha2.a) AS h FROM e
                JOIN ha2 ON e.dst = ha2.node GROUP BY e.src),
            ha3 AS MATERIALIZED (
                SELECT e.dst AS node, SUM(hh2.h) AS a FROM e
                JOIN hh2 ON e.src = hh2.node GROUP BY e.dst),
            hh3 AS MATERIALIZED (
                SELECT e.src AS node, SUM(ha3.a) AS h FROM e
                JOIN ha3 ON e.dst = ha3.node GROUP BY e.src)
            SELECT 'pr' AS kind, node, ROUND(rank, 8) AS v FROM r4
            UNION ALL
            SELECT 'hits_auth', n.node,
                   CAST(COALESCE(ha3.a, 0) AS DOUBLE)
            FROM nodes n LEFT JOIN ha3 ON n.node = ha3.node
            UNION ALL
            SELECT 'hits_hub', n.node,
                   CAST(COALESCE(hh3.h, 0) AS DOUBLE)
            FROM nodes n LEFT JOIN hh3 ON n.node = hh3.node
        """,
        "anti_join": """
            SELECT * FROM customer
            WHERE c_custkey NOT IN
                  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        """,
        "window_functions": """
            SELECT user_id, event_id, ts, value,
                   ROUND(LAG(value) OVER w, 6) AS lag_value,
                   ROUND(LEAD(value) OVER w, 6) AS lead_value,
                   ROUND(SUM(value) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING), 6) AS running_sum,
                   ROW_NUMBER() OVER w AS row_num,
                   ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
                   ROUND(CUME_DIST() OVER w, 6) AS cume_dist,
                   NTILE(4) OVER w AS ntile
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "set_ops": """
            WITH v AS (SELECT DISTINCT user_id, DATE_TRUNC('day', ts) AS day
                       FROM events WHERE event_type = 'view'),
                 p AS (SELECT DISTINCT user_id, DATE_TRUNC('day', ts) AS day
                       FROM events WHERE event_type = 'purchase')
            SELECT 'except' AS op, user_id, day
            FROM (SELECT * FROM v EXCEPT SELECT * FROM p)
            UNION ALL
            SELECT 'intersect' AS op, user_id, day
            FROM (SELECT * FROM v INTERSECT SELECT * FROM p)
        """,
        "pivot_unpivot": """
            SELECT user_id, key, CAST(value AS DOUBLE) AS value
            FROM (
                SELECT user_id,
                       ROUND(SUM(CASE WHEN event_type='click' THEN value
                                 ELSE 0 END), 3) AS v_click,
                       ROUND(SUM(CASE WHEN event_type='error' THEN value
                                 ELSE 0 END), 3) AS v_error,
                       ROUND(SUM(CASE WHEN event_type='purchase' THEN value
                                 ELSE 0 END), 3) AS v_purchase,
                       ROUND(SUM(CASE WHEN event_type='signup' THEN value
                                 ELSE 0 END), 3) AS v_signup,
                       ROUND(SUM(CASE WHEN event_type='view' THEN value
                                 ELSE 0 END), 3) AS v_view
                FROM events GROUP BY user_id
            )
            UNPIVOT (value FOR key IN
                     (v_click, v_error, v_purchase, v_signup, v_view))
        """,
        "group_rank": """
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS row_number,
                   RANK() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC) AS rank,
                   DENSE_RANK() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC) AS dense_rank
            FROM orders
        """,
        "rollup": """
            WITH cube_t AS (
              SELECT COALESCE(l_returnflag, '(all)') AS l_returnflag,
                     COALESCE(l_linestatus, '(all)') AS l_linestatus,
                     COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_v
              FROM lineitem
              GROUP BY CUBE(l_returnflag, l_linestatus)
            )
            SELECT 'cube' AS kind, * FROM cube_t
            UNION ALL
            SELECT 'rollup' AS kind, * FROM cube_t
            WHERE NOT (l_returnflag = '(all)'
                       AND l_linestatus <> '(all)')
        """,
        "bloom_semi_join": """
            SELECT * FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "asof_join": """
            SELECT l.*, r.ts AS ts_r, r.event_id AS event_id_r,
                   r.value AS value_r
            FROM (SELECT * FROM events WHERE event_type <> 'purchase') l
            ASOF JOIN (SELECT user_id, ts, event_id, value FROM events
                       WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "range_join": """
            SELECT e.event_id, e.ts, e.user_id, w.win_id, w.ws, w.we
            FROM events e
            JOIN (SELECT event_id AS win_id, ts AS ws,
                         ts + INTERVAL 30 MINUTE AS we
                  FROM events WHERE event_id % 97 = 0) w
              ON e.ts BETWEEN w.ws AND w.we
        """,
        "samples": """
            SELECT doc_id, source, 'hash' AS kind FROM documents
            WHERE SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < '19'
            UNION ALL
            SELECT doc_id, source, 'stratified' AS kind FROM (
                SELECT doc_id, source FROM documents
                QUALIFY ROW_NUMBER() OVER (
                    PARTITION BY source
                    ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
                ) <= 10
            )
            UNION ALL
            SELECT o_orderkey AS doc_id, 'orders' AS source,
                   'weighted' AS kind
            FROM (
                SELECT o_orderkey FROM orders
                ORDER BY POW((('0x' || SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)),
                                              1, 8))::BIGINT + 1)
                             / 4294967297.0,
                             1.0 / o_totalprice) DESC,
                         o_orderkey ASC
                LIMIT 100
            )
            UNION ALL
            SELECT doc_id, source, 'mixture' AS kind FROM documents
            WHERE SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2)
                  < REPEAT(SUBSTR(MD5(source), 1, 1), 2)
            UNION ALL
            SELECT doc_id, source,
                   'split_' || CASE
                       WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                           THEN 'train'
                       WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                           THEN 'val'
                       ELSE 'test' END AS kind
            FROM documents
            UNION ALL
            SELECT doc_id, source, 'epoch' || CAST(k AS VARCHAR) AS kind
            FROM (
              SELECT doc_id, source,
                     (('0x' || SUBSTR(MD5(source), 1, 1))::BIGINT + 2) // 4
                     + CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2)
                                 < printf('%02x',
                                     64 * ((('0x' || SUBSTR(MD5(source), 1, 1))
                                            ::BIGINT + 2) % 4))
                            THEN 1 ELSE 0 END AS copies
              FROM documents
            ), UNNEST(range(copies)) u(k)
        """,
        "quantiles": """
            SELECT o_orderstatus,
                   ROUND(quantile_cont(o_totalprice, 0.25), 4) AS q25,
                   ROUND(quantile_cont(o_totalprice, 0.50), 4) AS q50,
                   ROUND(quantile_cont(o_totalprice, 0.75), 4) AS q75,
                   ROUND(quantile_cont(o_totalprice, 0.95), 4) AS q95
            FROM orders GROUP BY o_orderstatus
            UNION ALL
            SELECT '(all)',
                   ROUND(quantile_cont(l_extendedprice, 0.25), 4),
                   ROUND(quantile_cont(l_extendedprice, 0.50), 4),
                   ROUND(quantile_cont(l_extendedprice, 0.75), 4),
                   ROUND(quantile_cont(l_extendedprice, 0.95), 4)
            FROM lineitem
            UNION ALL
            SELECT '(kmv:events.value)',
                   ROUND(QUANTILE_CONT(value, 0.25), 4),
                   ROUND(QUANTILE_CONT(value, 0.50), 4),
                   ROUND(QUANTILE_CONT(value, 0.75), 4),
                   ROUND(QUANTILE_CONT(value, 0.95), 4)
            FROM (SELECT value FROM events
                  ORDER BY MD5(CAST(event_id AS VARCHAR)), event_id
                  LIMIT 2000)
        """,
        "grouped_topk": """
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY o_orderstatus
                ORDER BY o_totalprice DESC, o_orderkey ASC
            ) <= 5
        """,
        "session_windows": """
            WITH o AS (
                SELECT user_id, ts,
                       CASE WHEN LAG(ts) OVER w IS NULL
                                 OR ts - LAG(ts) OVER w > INTERVAL 1800 SECOND
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (
                SELECT user_id, ts,
                       SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_id
                FROM o
            ),
            o2 AS (
                SELECT event_type, ts,
                       CASE WHEN LAG(ts) OVER w IS NULL
                                 OR ts - LAG(ts) OVER w > INTERVAL 600 SECOND
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY event_type ORDER BY ts)
            ),
            s2 AS (
                SELECT event_type, ts,
                       SUM(is_new) OVER (PARTITION BY event_type ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_id
                FROM o2
            )
            SELECT CAST(user_id AS VARCHAR) AS key,
                   CAST(session_id AS BIGINT) AS session_id,
                   COUNT(*) AS n_events, MIN(ts) AS t_start,
                   MAX(ts) AS t_end, 'plain' AS kind
            FROM s GROUP BY user_id, session_id
            UNION ALL
            SELECT event_type AS key,
                   CAST(session_id AS BIGINT) AS session_id,
                   COUNT(*) AS n_events, MIN(ts) AS t_start,
                   MAX(ts) AS t_end, 'salted' AS kind
            FROM s2 GROUP BY event_type, session_id
        """,
        "salted_grouped_topk": """
            SELECT event_id, event_type, value FROM events
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY event_type
                ORDER BY value DESC, event_id ASC
            ) <= 5
        """,
        "salted_shuffle_join": """
            SELECT e.event_id, e.event_type, t.type_n
            FROM events e
            JOIN (SELECT event_type, COUNT(*) AS type_n
                  FROM events GROUP BY event_type) t
            USING (event_type)
        """,
        "paragraph_dedup": """
            WITH aug AS (
                SELECT doc_id,
                       'corpus header all rights reserved | ' || text
                       || ' | footer of ' || source AS text
                FROM documents
            ),
            ps AS (SELECT doc_id, str_split(text, ' | ') AS p FROM aug),
            pars AS (
                SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                       p[i] AS paragraph
                FROM ps, UNNEST(range(1, LEN(p)+1)) AS u(i)
            )
            SELECT doc_id, pos, paragraph FROM pars
            QUALIFY ROW_NUMBER() OVER (PARTITION BY paragraph
                                       ORDER BY doc_id, pos) = 1
        """,
        "distinct_types": "SELECT DISTINCT event_type FROM events",
        "union_all": """
            SELECT * FROM orders WHERE o_orderstatus = 'O'
            UNION ALL
            SELECT * FROM orders WHERE o_orderstatus = 'F'
        """,
        "windowed_agg": """
            WITH t AS (
                SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                           AS window_start,
                       COUNT(*) AS n, ROUND(SUM(value), 3) AS total_value
                FROM events GROUP BY 1
            ),
            e AS (
                SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, value
                FROM events
            ),
            x AS (
                SELECT es, value,
                       UNNEST(range(CAST(FLOOR((es - 3600.0) / 900.0) AS BIGINT) + 1,
                                    CAST(FLOOR(es / 900.0) AS BIGINT) + 1)) AS k
                FROM e
            ),
            h AS (
                SELECT k * 900 AS window_start, COUNT(*) AS n,
                       ROUND(SUM(value), 3) AS total_value
                FROM x GROUP BY 1
            )
            SELECT 'tumbling' AS kind, * FROM t
            UNION ALL
            SELECT 'hopping' AS kind, * FROM h
        """,
        "simhash": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(str_split(text, ' '), t -> t <> '') AS tk
                FROM documents
            ),
            pos AS (
                SELECT doc_id, tk, LEAST(3, len(tk)) AS w,
                       UNNEST(range(1, len(tk) - LEAST(3, len(tk)) + 2)) AS i
                FROM toks WHERE len(tk) >= 1
            ),
            sh AS (
                SELECT doc_id,
                       CAST(('0x' || SUBSTR(MD5(
                           array_to_string(tk[i : i + w - 1], ' ')
                       ), 1, 8)) AS BIGINT) AS xhi,
                       CAST(('0x' || SUBSTR(MD5(
                           array_to_string(tk[i : i + w - 1], ' ')
                       ), 9, 8)) AS BIGINT) AS xlo
                FROM pos
            ),
            bits AS (
                SELECT doc_id, b,
                       SUM(CASE WHEN (CASE WHEN b >= 32 THEN xhi >> (b - 32)
                                           ELSE xlo >> b END) & 1 = 1
                           THEN 1 ELSE -1 END) AS s
                FROM sh, UNNEST(range(0, 64)) u(b)
                GROUP BY doc_id, b
            ),
            sig AS (
                SELECT d.doc_id,
                       COALESCE(SUM(CASE WHEN bt.s > 0 AND bt.b >= 32
                                         THEN CAST(1 AS BIGINT) << (bt.b - 32)
                                         ELSE 0 END), 0) AS hi,
                       COALESCE(SUM(CASE WHEN bt.s > 0 AND bt.b < 32
                                         THEN CAST(1 AS BIGINT) << bt.b
                                         ELSE 0 END), 0) AS lo
                FROM (SELECT doc_id FROM documents) d
                LEFT JOIN bits bt USING (doc_id)
                GROUP BY d.doc_id
            )
            SELECT 'sig' AS kind, doc_id AS id_a, CAST(-1 AS BIGINT) AS id_b,
                   CAST(hi AS BIGINT) AS hi, CAST(lo AS BIGINT) AS lo,
                   CAST(-1 AS BIGINT) AS hamming
            FROM sig
            UNION ALL
            SELECT 'pairs', a.doc_id, b.doc_id,
                   CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                   CAST(bit_count(xor(a.hi, b.hi))
                        + bit_count(xor(a.lo, b.lo)) AS BIGINT)
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.hi, b.hi))
                  + bit_count(xor(a.lo, b.lo)) <= 3
        """,
        "flatten_tokens": _flatten_tokens_oracle(),
        "sketches": """
            SELECT 'hll' AS kind, event_type AS key,
                   COUNT(DISTINCT user_id) AS n, TRUE AS within_bound
            FROM events GROUP BY event_type
            UNION ALL
            SELECT 'hll', '(all)', COUNT(DISTINCT user_id), TRUE
            FROM events
            UNION ALL
            SELECT 'mg', CAST(user_id AS VARCHAR), COUNT(*), TRUE
            FROM events GROUP BY user_id
            UNION ALL
            SELECT 'json', CAST(k AS VARCHAR), n, TRUE FROM (
                SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
                       COUNT(*) AS n
                FROM events GROUP BY k
            )
            UNION ALL
            SELECT 'cm', CAST(user_id AS VARCHAR), COUNT(*), TRUE
            FROM events GROUP BY user_id
        """,
        "pack_bins": """
            WITH RECURSIVE toks AS (
                SELECT source, doc_id, LEN(str_split(text, ' ')) AS n
                FROM documents
            ),
            d AS (
                SELECT source, list(n ORDER BY doc_id) AS sz,
                       list(doc_id ORDER BY doc_id) AS ids
                FROM toks GROUP BY source
            ),
            w AS (
                SELECT source, sz, ids, 1 AS i, CAST(0 AS BIGINT) AS bin,
                       CAST(sz[1] AS BIGINT) AS fill
                FROM d WHERE len(sz) >= 1
                UNION ALL
                SELECT source, sz, ids, i + 1,
                       CASE WHEN fill + sz[i+1] <= 256 THEN bin
                            ELSE bin + 1 END,
                       CAST(CASE WHEN fill + sz[i+1] <= 256
                                 THEN fill + sz[i+1]
                                 ELSE sz[i+1] END AS BIGINT)
                FROM w WHERE i < len(sz)
            )
            SELECT source, ids[i] AS doc_id,
                   CAST(sz[i] AS BIGINT) AS n_tokens, bin AS bin_id
            FROM w
        """,
        "dup_spans": """
            WITH toks AS (
              SELECT doc_id, str_split(text, ' ') AS t FROM documents
            ), grams AS (
              SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                     array_to_string(t[i:i+4], ' ') AS gram
              FROM toks, UNNEST(range(1, len(t) - 3)) u(i)
            ), dup AS (
              SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
            ), hits AS (
              SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)
            ), marked AS (
              SELECT doc_id, pos,
                     CASE WHEN pos - LAG(pos) OVER (
                              PARTITION BY doc_id ORDER BY pos) <= 5
                          THEN 0 ELSE 1 END AS isl
              FROM hits
            ), grp AS (
              SELECT doc_id, pos,
                     SUM(isl) OVER (PARTITION BY doc_id ORDER BY pos) AS g
              FROM marked
            ), cover AS (
              SELECT DISTINCT doc_id, pos + k AS i
              FROM hits, UNNEST(range(0, 5)) w(k)
            ), tok2 AS (
              SELECT doc_id, unnest(t) AS w,
                     CAST(generate_subscripts(t, 1) - 1 AS BIGINT) AS i
              FROM toks
            ), keep AS (
              SELECT t2.doc_id, t2.w, t2.i FROM tok2 t2
              WHERE NOT EXISTS (SELECT 1 FROM cover c
                                WHERE c.doc_id = t2.doc_id AND c.i = t2.i)
            )
            SELECT 'span' AS kind, doc_id AS a, MIN(pos) AS b,
                   CAST(MAX(pos) + 5 AS VARCHAR) || ':' ||
                       CAST(COUNT(*) AS VARCHAR) AS v
            FROM grp GROUP BY doc_id, g
            UNION ALL
            SELECT 'clean' AS kind, d.doc_id AS a,
                   CAST(len(str_split(d.text, ' ')) - COUNT(k.i)
                        AS BIGINT) AS b,
                   COALESCE(string_agg(k.w, ' ' ORDER BY k.i), '') AS v
            FROM documents d LEFT JOIN keep k ON k.doc_id = d.doc_id
            GROUP BY d.doc_id, d.text
        """,
        # gopher_* arms reuse the doc_profile repetition CTEs; mean_wlen is
        # list_avg = (exact int sum)/(exact int count), the same IEEE
        # division the engine computes as (len(text)-(n_tok-1))/n_tok —
        # bit-identical, no rounding anywhere in the gopher arms
        "quality_score": """
            WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t
                          FROM documents),
            tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
            tc AS (SELECT doc_id, w, COUNT(*) AS c FROM tok
                   GROUP BY doc_id, w),
            rep1 AS (SELECT doc_id,
                            MAX(c) / CAST(SUM(c) AS BIGINT) AS tt
                     FROM tc GROUP BY doc_id),
            grams AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
                      FROM toks,
                           UNNEST(range(1, GREATEST(LEN(t)-1, 0)+1)) u(i)),
            rep2 AS (SELECT doc_id,
                            (COUNT(*) - COUNT(DISTINCT g))
                                / CAST(COUNT(*) AS BIGINT) AS dg
                     FROM grams GROUP BY doc_id),
            sig AS (
                SELECT t.doc_id,
                       LEN(t.t) AS n_tokens,
                       list_avg(list_transform(t.t, x -> LEN(x)))
                           AS mean_wlen,
                       (list_contains(t.t, 'the')::INT
                        + list_contains(t.t, 'of')::INT
                        + list_contains(t.t, 'and')::INT
                        + list_contains(t.t, 'to')::INT
                        + list_contains(t.t, 'in')::INT
                        + list_contains(t.t, 'that')::INT
                        + list_contains(t.t, 'with')::INT
                        + list_contains(t.t, 'for')::INT) AS stop_hits,
                       rep1.tt AS top_token_frac,
                       COALESCE(rep2.dg, 0.0) AS dup_2gram_frac
                FROM toks t
                JOIN rep1 USING (doc_id)
                LEFT JOIN rep2 ON rep2.doc_id = t.doc_id
            )
            SELECT doc_id, 'model' AS kind,
                   ROUND(1.0 / (1.0 + EXP(-(
                       -1.0
                       + 0.002 * LENGTH(text)
                       - 0.01 * LEN(str_split(text, ' '))
                       + 0.3 * (CAST(LENGTH(text) AS DOUBLE)
                                / GREATEST(LEN(str_split(text, ' ')), 1))
                       + 5.0 * ((LENGTH(text)
                                 - LENGTH(REPLACE(text, '.', '')))
                                / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0))
                   ))), 6) AS score
            FROM documents
            UNION ALL SELECT doc_id, 'gopher_n_tokens',
                             CAST(n_tokens AS DOUBLE) FROM sig
            UNION ALL SELECT doc_id, 'gopher_mean_wlen', mean_wlen FROM sig
            UNION ALL SELECT doc_id, 'gopher_stop_hits',
                             CAST(stop_hits AS DOUBLE) FROM sig
            UNION ALL SELECT doc_id, 'gopher_top_token_frac',
                             top_token_frac FROM sig
            UNION ALL SELECT doc_id, 'gopher_dup_2gram_frac',
                             dup_2gram_frac FROM sig
            UNION ALL SELECT doc_id, 'gopher_keep',
                             CASE WHEN n_tokens BETWEEN 32 AND 100000
                                   AND mean_wlen >= 3.0
                                   AND mean_wlen <= 4.6
                                   AND stop_hits >= 1
                                   AND top_token_frac <= 0.10
                                   AND dup_2gram_frac <= 0.05
                                  THEN 1.0 ELSE 0.0 END
                      FROM sig
            UNION ALL
            SELECT doc_id, 'ppl' AS kind,
                   -SUM(lpm) / (COUNT(*) * 1000000.0) AS score
            FROM (
                WITH btoks AS (SELECT doc_id, source,
                                      str_split(text, ' ') AS t
                               FROM documents),
                bgrams AS (SELECT doc_id, source, t[i] AS w1, t[i+1] AS w2
                           FROM btoks, UNNEST(range(1, len(t))) u(i)),
                train AS (SELECT w1, w2 FROM bgrams WHERE source IN
                          ('src0','src1','src2','src3','src4')),
                cb AS (SELECT w1, w2, COUNT(*) AS c FROM train
                       GROUP BY w1, w2),
                cu AS (SELECT w1, COUNT(*) AS c FROM train GROUP BY w1),
                vv AS (SELECT COUNT(DISTINCT w) AS v FROM
                       (SELECT w1 AS w FROM train
                        UNION ALL SELECT w2 FROM train))
                SELECT g.doc_id,
                       CAST(ROUND(LN((COALESCE(cb.c, 0) + 0.5)
                                     / (COALESCE(cu.c, 0) + 0.5 * vv.v))
                                  * 1000000) AS BIGINT) AS lpm
                FROM bgrams g
                LEFT JOIN cb ON g.w1 = cb.w1 AND g.w2 = cb.w2
                LEFT JOIN cu ON g.w1 = cu.w1
                CROSS JOIN vv
            ) GROUP BY doc_id
            UNION ALL
            SELECT doc_id, 'dsir' AS kind,
                   SUM(lrm) / (COUNT(*) * 1000000.0) AS score
            FROM (
                WITH dtoks AS (SELECT doc_id, source,
                                      str_split(text, ' ') AS t
                               FROM documents),
                dgrams AS (SELECT doc_id, source, t[i] AS w1, t[i+1] AS w2
                           FROM dtoks, UNNEST(range(1, len(t))) u(i)),
                feats AS (SELECT doc_id, source,
                                 CAST(('0x' || SUBSTR(MD5(w1 || ' ' || w2),
                                                      1, 8))::BIGINT
                                      % 4096 AS BIGINT) AS b
                          FROM dgrams),
                tgt AS (SELECT b, COUNT(*) AS c FROM feats
                        WHERE source IN
                            ('src0','src1','src2','src3','src4')
                        GROUP BY b),
                tn AS (SELECT COUNT(*) AS n FROM feats
                       WHERE source IN
                           ('src0','src1','src2','src3','src4')),
                sh AS (SELECT b, COUNT(*) AS c FROM feats GROUP BY b),
                sn AS (SELECT COUNT(*) AS n FROM feats)
                SELECT f.doc_id,
                       CAST(ROUND(LN(((COALESCE(t.c, 0) + 0.5)
                                      / (tn.n + 0.5 * 4096))
                                     / ((s.c + 0.5)
                                        / (sn.n + 0.5 * 4096)))
                                  * 1000000) AS BIGINT) AS lrm
                FROM feats f
                LEFT JOIN tgt t ON f.b = t.b
                JOIN sh s ON f.b = s.b
                CROSS JOIN tn CROSS JOIN sn
            ) GROUP BY doc_id
            UNION ALL
            SELECT doc_id, 'nb' AS kind,
                   CAST(pm + sm AS DOUBLE) / 1000000 AS score
            FROM (
                WITH ntok AS (
                    SELECT doc_id, UNNEST(str_split(text, ' ')) AS w,
                           CASE WHEN source IN
                               ('src0','src1','src2','src3','src4')
                               THEN 1 ELSE 0 END AS lab
                    FROM documents),
                ncnt AS (SELECT w, SUM(lab) AS cpos,
                                COUNT(*) - SUM(lab) AS cneg
                         FROM ntok GROUP BY w),
                nsca AS (SELECT SUM(lab) AS tpos,
                                COUNT(*) - SUM(lab) AS tneg,
                                COUNT(DISTINCT w) AS v
                         FROM ntok),
                npri AS (SELECT CAST(ROUND(LN(
                             CAST(SUM(CASE WHEN source IN
                                 ('src0','src1','src2','src3','src4')
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                             / (COUNT(*) - SUM(CASE WHEN source IN
                                 ('src0','src1','src2','src3','src4')
                                 THEN 1 ELSE 0 END)))
                             * 1000000) AS BIGINT) AS pm
                         FROM documents)
                SELECT t.doc_id, ANY_VALUE(npri.pm) AS pm,
                       SUM(CAST(ROUND((
                           LN((c.cpos + 0.5) / (s.tpos + 0.5 * s.v))
                           - LN((c.cneg + 0.5) / (s.tneg + 0.5 * s.v)))
                           * 1000000) AS BIGINT)) AS sm
                FROM ntok t
                JOIN ncnt c ON c.w = t.w
                CROSS JOIN nsca s CROSS JOIN npri
                GROUP BY t.doc_id
            )
        """,
        # the 16 (a, b) pairs are np.random.RandomState(7) draws — the
        # engine's _perm_params(16); the shingle hash is the repo's
        # standard md5 idiom (engine hash_mode="md5"); the permutation
        # runs in HUGEINT so a·x (< 2^93) never overflows
        "minhash_signatures": """
            WITH RECURSIVE toks AS (
                SELECT doc_id,
                       list_filter(str_split(text, ' '), t -> t <> '') AS tk
                FROM documents
            ),
            pos AS (
                SELECT doc_id, tk, LEAST(3, len(tk)) AS w,
                       UNNEST(range(1, len(tk) - LEAST(3, len(tk)) + 2)) AS i
                FROM toks WHERE len(tk) >= 1
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       CAST(('0x' || SUBSTR(MD5(
                           array_to_string(tk[i : i + w - 1], ' ')
                       ), 1, 8)) AS BIGINT) AS x
                FROM pos
            ),
            perms(perm, a, b) AS (VALUES
                (0,  1407639518939636933, 1630422002828422847),
                (1,  551904368352831991,  1422685883315097400),
                (2,  1169693746941186260, 1036818128723030199),
                (3,  1816361973745530472, 459309668489100400),
                (4,  1899821249326607546, 1854800229375720637),
                (5,  710123494352685592,  1385894553171423522),
                (6,  20668929189138778,   1942495339429673161),
                (7,  1329108821600893483, 894481085146036774),
                (8,  340139256470221705,  629557289527310830),
                (9,  2303675491809990631, 150699654041190231),
                (10, 1000366761065432497, 431885845465162947),
                (11, 991310334879981960,  7560552725577555),
                (12, 109594561920622081,  811901033415426305),
                (13, 1216310873990163256, 1710988252442831248),
                (14, 703662130126978055,  1472955763471030175),
                (15, 638137941648739773,  2135503771371547564)),
            sig AS (
                SELECT s.doc_id, CAST(p.perm AS BIGINT) AS perm,
                       CAST(MIN((CAST(p.a AS HUGEINT) * s.x + p.b)
                                % 2305843009213693951) AS BIGINT) AS minhash
                FROM sh s CROSS JOIN perms p
                GROUP BY s.doc_id, p.perm
            ),
            bandfp AS (
                SELECT doc_id, perm // 4 AS band,
                       STRING_AGG(CAST(minhash AS VARCHAR), ','
                                  ORDER BY perm) AS fp
                FROM sig GROUP BY doc_id, perm // 4
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bandfp a JOIN bandfp b
                  ON a.band = b.band AND a.fp = b.fp
                 AND a.doc_id < b.doc_id
            ),
            jac AS (
                SELECT c.id_a, c.id_b,
                       (SELECT COUNT(*) FROM sh sa JOIN sh sb
                         ON sa.x = sb.x
                        WHERE sa.doc_id = c.id_a
                          AND sb.doc_id = c.id_b) AS i,
                       (SELECT COUNT(*) FROM sh
                        WHERE doc_id = c.id_a) AS na,
                       (SELECT COUNT(*) FROM sh
                        WHERE doc_id = c.id_b) AS nb
                FROM cand c
            ),
            pairsv AS (
                SELECT id_a, id_b,
                       CAST(i AS DOUBLE)
                           / CAST(na + nb - i AS DOUBLE) AS j
                FROM jac
                WHERE CAST(i AS DOUBLE)
                          / CAST(na + nb - i AS DOUBLE) >= 0.35
            ),
            edges AS (
                SELECT id_a AS u, id_b AS v FROM pairsv
                UNION ALL
                SELECT id_b, id_a FROM pairsv
            ),
            reach(u, v) AS (
                SELECT u, v FROM edges
                UNION
                SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
            ),
            comp AS (
                SELECT u AS node, LEAST(u, MIN(v)) AS component
                FROM reach GROUP BY u
            )
            SELECT 'sig' AS kind, doc_id, CAST(-1 AS BIGINT) AS other,
                   perm, minhash, CAST(0 AS DOUBLE) AS jaccard
            FROM sig
            UNION ALL
            SELECT 'pair', id_a, id_b, CAST(-1 AS BIGINT),
                   CAST(-1 AS BIGINT), ROUND(j, 4)
            FROM pairsv
            UNION ALL
            SELECT 'keep', doc_id, CAST(-1 AS BIGINT),
                   CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
                   CAST(0 AS DOUBLE)
            FROM (
                SELECT doc_id FROM documents
                EXCEPT
                SELECT node FROM comp WHERE component < node
            )
        """,
        "tfidf": """
            WITH toks AS (
                SELECT doc_id, UNNEST(str_split(text, ' ')) AS token
                FROM documents
            ),
            tf AS (
                SELECT doc_id, token, COUNT(*) AS tf
                FROM toks GROUP BY doc_id, token
            ),
            df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
            dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
            stats AS (
                SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n,
                       CAST((SELECT SUM(tf) FROM tf) AS DOUBLE)
                           / CAST((SELECT COUNT(*) FROM documents)
                                  AS DOUBLE) AS avgdl
            )
            SELECT tf.doc_id, tf.token, tf.tf, df.df, dl.dl,
                   ROUND(tf.tf * LN(CAST((SELECT COUNT(*) FROM documents)
                                         AS DOUBLE)
                                    / CAST(df.df AS DOUBLE)), 6) AS tfidf,
                   ROUND(LN(1.0 + (s.n - CAST(df.df AS DOUBLE) + 0.5)
                                  / (CAST(df.df AS DOUBLE) + 0.5))
                         * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                         / (CAST(tf.tf AS DOUBLE)
                            + 1.2 * (1.0 - 0.75
                                     + 0.75 * CAST(dl.dl AS DOUBLE)
                                       / s.avgdl)), 6) AS bm25
            FROM tf JOIN df USING (token) JOIN dl USING (doc_id), stats s
        """,
        "doc_profile": f"""
            WITH {_lang_cte().strip().rstrip()},
            toks AS (SELECT doc_id, str_split(text, ' ') AS t
                          FROM documents),
            tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
            tc AS (SELECT doc_id, w, COUNT(*) AS c FROM tok
                   GROUP BY doc_id, w),
            rep1 AS (SELECT doc_id,
                            MAX(c) / CAST(SUM(c) AS BIGINT)
                                AS top_token_frac
                     FROM tc GROUP BY doc_id),
            grams AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
                      FROM toks,
                           UNNEST(range(1, GREATEST(LEN(t)-1, 0)+1)) u(i)),
            rep2 AS (SELECT doc_id,
                            (COUNT(*) - COUNT(DISTINCT g))
                                / CAST(COUNT(*) AS BIGINT) AS dup_2gram_frac
                     FROM grams GROUP BY doc_id)
            SELECT d.doc_id, LENGTH(text) AS n_chars2,
                   LEN(str_split(text, ' ')) AS n_tokens,
                   len(regexp_extract_all(text,
                       '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+|\s+')) AS n_bpe_tokens,
                   MD5(text) AS fp,
                   rep1.top_token_frac,
                   COALESCE(rep2.dup_2gram_frac, 0.0) AS dup_2gram_frac,
                   lang.lang_pred, lang.lang_score
            FROM documents d
            JOIN rep1 USING (doc_id)
            LEFT JOIN rep2 ON rep2.doc_id = d.doc_id
            JOIN lang USING (doc_id)
        """,
        "token_count_by_source": """
            WITH stok AS (SELECT source, UNNEST(str_split(text, ' ')) AS w
                          FROM documents),
            sc AS (SELECT source, w, COUNT(*) AS c FROM stok
                   GROUP BY source, w),
            agg AS (SELECT source,
                           CAST(SUM(c) AS BIGINT) AS n_tokens,
                           COUNT(*) AS n_types,
                           CAST(SUM(CAST(ROUND(c * LN(c) * 1000000)
                                         AS BIGINT)) AS BIGINT) AS sm
                    FROM sc GROUP BY source),
            dn AS (SELECT source, COUNT(*) AS n_docs FROM documents
                   GROUP BY source)
            SELECT a.source, dn.n_docs, a.n_tokens, a.n_types,
                   CAST(a.n_types AS DOUBLE) / a.n_tokens AS ttr,
                   LN(a.n_tokens) - a.sm / (a.n_tokens * 1000000.0)
                       AS entropy
            FROM agg a JOIN dn USING (source)
        """,

        "exact_dedup_docs": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY array_to_string(str_split(text, ' ')[1:5], ' ')
                ORDER BY doc_id) = 1
        """,


        "clean_corpus": """
            WITH q AS (
                SELECT doc_id, source,
                       len(string_split(text, ' ')) AS n_tokens,
                       length(text) AS n_chars,
                       md5(text) AS fp
                FROM documents
            ),
            d AS (
                SELECT * FROM q
                WHERE n_tokens >= 5 AND n_chars <= 20000
                QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
            )
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
            FROM d GROUP BY source
        """,
        "dedup_clusters": _dedup_clusters_oracle(),
        "embedding_srp_dedup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
        """,
        # all four multimodal stages joined per doc (image decode stub
        # dims, resize contract, audio stub metadata, frame-sample
        # aggregate) — one row per document, matching the engine's joined
        # branch pipeline
        "media_pipeline": """
            WITH m AS (
                SELECT doc_id, octet_length(encode(text)) AS n FROM documents
            ),
            img AS (
                SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
                       CAST(n % 640 AS INTEGER) AS width,
                       CAST(n % 480 AS INTEGER) AS height
                FROM m
            ),
            rez AS (
                SELECT doc_id, n_bytes, width, height,
                       CAST(CASE WHEN GREATEST(width, height, 1) > 256
                            THEN width * 256 // GREATEST(width, height, 1)
                            ELSE width END AS INTEGER) AS out_width,
                       CAST(CASE WHEN GREATEST(width, height, 1) > 256
                            THEN height * 256 // GREATEST(width, height, 1)
                            ELSE height END AS INTEGER) AS out_height
                FROM img
            ),
            au AS (
                SELECT doc_id,
                       CAST(8000 + n % 8000 AS INTEGER) AS sample_rate,
                       CAST(n % 2 + 1 AS INTEGER) AS channels,
                       CAST(n AS BIGINT) AS n_frames,
                       ROUND(CAST(n AS DOUBLE) / (8000 + n % 8000), 6)
                           AS duration_s
                FROM m
            ),
            fr0 AS (SELECT doc_id, n, n % 7 + 1 AS nf FROM m),
            fr AS (
                SELECT fr0.doc_id, COUNT(*) AS n_sampled_frames,
                       CAST(SUM(f.frame_idx * (fr0.n // fr0.nf)) AS BIGINT)
                           AS sum_frame_off
                FROM fr0, LATERAL (
                    SELECT UNNEST(range(0, fr0.nf, 2)) AS frame_idx
                ) f
                GROUP BY fr0.doc_id
            )
            SELECT rez.doc_id, rez.n_bytes, rez.width, rez.height,
                   rez.out_width, rez.out_height,
                   au.sample_rate, au.channels, au.n_frames, au.duration_s,
                   fr.n_sampled_frames, fr.sum_frame_off
            FROM rez
            JOIN au USING (doc_id)
            JOIN fr ON fr.doc_id = rez.doc_id
        """,
        "pack_sequences": """
            SELECT source, doc_id, n_tokens,
                   CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
                   CAST((SUM(n_tokens) OVER w - n_tokens) // 256 AS BIGINT)
                       AS pack_id
            FROM (SELECT source, doc_id,
                         LEN(str_split(text, ' ')) AS n_tokens
                  FROM documents)
            WINDOW w AS (PARTITION BY source ORDER BY doc_id)
        """,
        "redact_pii": """
            WITH aug AS (
                SELECT doc_id,
                       text
                       || CASE WHEN doc_id % 3 = 0
                          THEN ' contact u' || CAST(doc_id AS VARCHAR)
                               || '@example.com' ELSE '' END
                       || CASE WHEN doc_id % 4 = 0
                          THEN ' from 10.'
                               || CAST(100 + doc_id % 150 AS VARCHAR) || '.'
                               || CAST(doc_id % 250 AS VARCHAR) || '.'
                               || CAST(doc_id % 100 AS VARCHAR)
                          ELSE '' END
                       || CASE WHEN doc_id % 5 = 0
                          THEN ' ssn '
                               || CAST(100 + doc_id % 900 AS VARCHAR) || '-'
                               || CAST(10 + doc_id % 90 AS VARCHAR) || '-'
                               || CAST(1000 + doc_id % 9000 AS VARCHAR)
                          ELSE '' END AS text
                FROM documents
            ),
            s1 AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'
                       )) AS BIGINT) AS n_emails,
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS text
                FROM aug
            ),
            s2 AS (
                SELECT doc_id, n_emails,
                       CAST(len(regexp_extract_all(text,
                           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'
                       )) AS BIGINT) AS n_ips,
                       regexp_replace(text,
                           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                           '<IP>', 'g') AS text
                FROM s1
            )
            SELECT doc_id,
                   regexp_replace(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b',
                                  '<ID>', 'g') AS text,
                   n_emails, n_ips,
                   CAST(len(regexp_extract_all(text,
                       '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS BIGINT) AS n_ids
            FROM s2
        """,
        "decontaminate": """
            WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t
                          FROM documents),
            grams AS (
              SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                     array_to_string(t[i:i+7], ' ') AS g
              FROM toks, UNNEST(range(1, GREATEST(LEN(t)-7, 0)+1)) AS u(i)
            ),
            bench AS (SELECT DISTINCT g FROM grams
                      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                            < '10'),
            cand AS (SELECT DISTINCT doc_id, g FROM grams
                     WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                           >= '10'),
            cand_pos AS (SELECT doc_id, pos, g FROM grams
                         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                               >= '10'),
            hits AS (
              SELECT cp.doc_id, cp.pos FROM cand_pos cp JOIN bench USING (g)
            ), marked AS (
              SELECT doc_id, pos,
                     CASE WHEN pos - LAG(pos) OVER (
                              PARTITION BY doc_id ORDER BY pos) <= 8
                          THEN 0 ELSE 1 END AS isl
              FROM hits
            ), grp AS (
              SELECT doc_id, pos,
                     SUM(isl) OVER (PARTITION BY doc_id ORDER BY pos) AS gi
              FROM marked
            )
            SELECT 'doc' AS kind, cand.doc_id AS a,
                   CAST(COUNT(*) AS BIGINT) AS b, '' AS v
            FROM cand JOIN bench USING (g)
            GROUP BY cand.doc_id
            UNION ALL
            SELECT 'span' AS kind, doc_id AS a, MIN(pos) AS b,
                   CAST(MAX(pos) + 8 AS VARCHAR) || ':' ||
                       CAST(COUNT(*) AS VARCHAR) AS v
            FROM grp GROUP BY doc_id, gi
        """,
        "ngram_jaccard": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> '') AS l
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS s
                FROM toks,
                     LATERAL (SELECT UNNEST(range(1, len(l) - 1)) AS i) r
                WHERE len(l) >= 3
            ),
            counts AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   ROUND(CAST(i AS DOUBLE) / (ca.c + cb.c - i), 6) AS jaccard
            FROM inter
            JOIN counts ca ON ca.doc_id = id_a
            JOIN counts cb ON cb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.5
        """,
        # rolling-hash CDC chunking, reproduced EXACTLY in SQL (VERDICT r3
        # item 7): byte codes via unicode() (corpus verified pure ASCII),
        # window hash as a 16-term HUGEINT polynomial with the engine's
        # P^t mod 2^64 constants, greedy min/max boundary walk as a
        # recursive CTE, chunk_fp = md5-low-64 little-endian byte swap
        "cdc": """
            WITH RECURSIVE d AS (
              SELECT doc_id, text, length(text) AS n,
                     list_transform(range(1, length(text)+1),
                                    i -> CAST(unicode(text[i]) AS HUGEINT)) AS b
              FROM documents
            ),
            -- cut candidates: rolling window hash of the 16 bytes ending
            -- at position c (FNV-prime polynomial mod 2^64; 64 | 2^64, so
            -- the low-6-bit mask test reduces to % 64 on the raw sum)
            cands AS (
              SELECT doc_id, text, n,
                     list_filter(range(16, n+1),
                                 c -> (b[c-15]*1::HUGEINT + b[c-14]*1099511628211::HUGEINT + b[c-13]*956575116354345::HUGEINT + b[c-12]*624165263380053675::HUGEINT + b[c-11]*11527715348014283921::HUGEINT + b[c-10]*913917546033277539::HUGEINT + b[c-9]*15895002104753931833::HUGEINT + b[c-8]*14218562807570617051::HUGEINT + b[c-7]*2232315406967589409::HUGEINT + b[c-6]*10622396531520239123::HUGEINT + b[c-5]*1775861927039214153::HUGEINT + b[c-4]*3510945102848213515::HUGEINT + b[c-3]*17673114087473428657::HUGEINT + b[c-2]*10372170898125509827::HUGEINT + b[c-1]*104005896588101465::HUGEINT + b[c-0]*2442422338666789947::HUGEINT) % 64 = 0) AS cl
              FROM d
            ),
            -- greedy boundary walk (min/max chunk length), one recursion
            -- step per chunk: next cut = first candidate in
            -- (start+32, start+1024], else the max-length/EOF cut
            chunks AS (
              SELECT doc_id, text, n, cl,
                     0 AS chunk_idx, CAST(0 AS BIGINT) AS chunk_off,
                     CAST(coalesce(list_aggregate(
                         list_filter(cl, x -> x > 32 AND x <= least(1024, n)),
                         'min'), least(1024, n)) AS BIGINT) AS cut
              FROM cands WHERE n > 0
              UNION ALL
              SELECT doc_id, text, n, cl,
                     chunk_idx + 1, cut,
                     CAST(coalesce(list_aggregate(
                         list_filter(cl, x -> x > cut + 32
                                          AND x <= least(cut + 1024, n)),
                         'min'), least(cut + 1024, n)) AS BIGINT)
              FROM chunks WHERE cut < n
            ),
            ch AS (
              SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
                     chunk_off, cut - chunk_off AS chunk_len,
                     md5(substr(text, CAST(chunk_off + 1 AS INTEGER),
                                CAST(cut - chunk_off AS INTEGER))) AS h
              FROM chunks
            ),
            fps AS (
              SELECT DISTINCT doc_id,
                     ('0x' || substr(h,15,2) || substr(h,13,2) || substr(h,11,2) || substr(h,9,2) || substr(h,7,2) || substr(h,5,2) || substr(h,3,2) || substr(h,1,2))::UBIGINT AS chunk_fp
              FROM ch
            )
            -- kind='chunk': every chunk as (a=doc_id, b=chunk_idx,
            -- v='off:len:fp'); kind='pair': partial-dup doc pairs sharing
            -- >= 3 fingerprints as (a=id_a, b=id_b, v=shared count)
            SELECT 'chunk' AS kind, doc_id AS a,
                   CAST(chunk_idx AS BIGINT) AS b,
                   CAST(chunk_off AS VARCHAR) || ':' ||
                   CAST(chunk_len AS VARCHAR) || ':' ||
                   CAST(('0x' || substr(h,15,2) || substr(h,13,2) || substr(h,11,2) || substr(h,9,2) || substr(h,7,2) || substr(h,5,2) || substr(h,3,2) || substr(h,1,2))::UBIGINT AS VARCHAR) AS v
            FROM ch
            UNION ALL
            SELECT 'pair', id_a, id_b, CAST(shared_chunks AS VARCHAR)
            FROM (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     COUNT(*) AS shared_chunks
              FROM fps a JOIN fps b
                ON a.chunk_fp = b.chunk_fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2
              HAVING COUNT(*) >= 3
            )
        """,
        # similarity-search suite: brute-force cosine top-5, IVF
        # nearest-centroid assignment (8 fixed centroids, ties → lowest
        # bucket matching np.argmax first-max-wins), and IVF ANN probe
        # search (nprobe=3, engine's deterministic tie-breaks), all in
        # DOUBLE precision, tagged (kind, id, other)
        "knn_ann": """
            WITH cent AS (
                SELECT vec_id AS bucket, CAST(embedding AS DOUBLE[]) AS cvec
                FROM embeddings WHERE vec_id < 8
            ),
            emb AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ),
            assign AS (
                SELECT vec_id, bucket FROM (
                    SELECT e.vec_id, c.bucket,
                           ROW_NUMBER() OVER (
                               PARTITION BY e.vec_id
                               ORDER BY list_cosine_similarity(e.v, c.cvec)
                                   DESC, c.bucket ASC) AS rn
                    FROM emb e CROSS JOIN cent c
                ) WHERE rn = 1
            ),
            q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 10),
            brute AS (
                SELECT query_id, neighbor_id FROM (
                    SELECT q.query_id, e.vec_id AS neighbor_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY q.query_id
                               ORDER BY list_cosine_similarity(q.qv, e.v)
                                   DESC, e.vec_id ASC) AS rn
                    FROM q JOIN emb e ON e.vec_id != q.query_id
                ) WHERE rn <= 5
            ),
            probes AS (
                SELECT query_id, bucket FROM (
                    SELECT q.query_id, c.bucket,
                           ROW_NUMBER() OVER (
                               PARTITION BY q.query_id
                               ORDER BY list_cosine_similarity(q.qv, c.cvec)
                                   DESC, c.bucket ASC) AS rn
                    FROM q CROSS JOIN cent c
                ) WHERE rn <= 3
            ),
            cand AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qv, e.v) AS sim
                FROM q
                JOIN probes p ON q.query_id = p.query_id
                JOIN assign a ON a.bucket = p.bucket
                JOIN emb e ON e.vec_id = a.vec_id
                WHERE e.vec_id != q.query_id
            ),
            ivfk AS (
                SELECT query_id, neighbor_id FROM (
                    SELECT query_id, neighbor_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rn
                    FROM cand
                ) WHERE rn <= 5
            ),
            crossp AS (
                SELECT l.vec_id AS id, r.vec_id AS other
                FROM emb l JOIN emb r ON r.vec_id % 7 = 0
                                     AND l.vec_id != r.vec_id
                WHERE list_cosine_similarity(l.v, r.v) >= 0.45
            )
            SELECT 'brute' AS kind, CAST(query_id AS BIGINT) AS id,
                   CAST(neighbor_id AS BIGINT) AS other FROM brute
            UNION ALL
            SELECT 'ivf_assign', CAST(vec_id AS BIGINT),
                   CAST(bucket AS BIGINT) FROM assign
            UNION ALL
            SELECT 'ivf_knn', CAST(query_id AS BIGINT),
                   CAST(neighbor_id AS BIGINT) FROM ivfk
            UNION ALL
            SELECT 'cross', CAST(id AS BIGINT),
                   CAST(other AS BIGINT) FROM crossp
        """,
        # error-bound oracle for the HLL sketch: SQL reproduces the exact
        # distinct count and the bound claim; a hash match proves the
        # engine's exact distinct AND that its estimate was within ±2%
        # rows-only (no SQL equivalent, parity proven in tests instead):
        # ann_sq8, minhash_signatures, minhash_lsh_dedup, simhash_docs,
        # simhash_dedup, ann_ivf_trained, ivf_pairs, semantic_dedup,
        # corpus_semantic_dedup, srp_cross_dedup, fuzzy_dedup_corpus,
        # crawl_smoke
    }
