"""O-32 HyperLogLog: accuracy vs exact distinct at 1e5 scale, register-merge
associativity, and the Dataset-level approx_distinct over string + int cols."""

import numpy as np
import pyarrow as pa
import pytest

from crawlray.ops.sketch import HLL, approx_distinct, splitmix64


def test_hll_accuracy_vs_exact():
    for n in (1_000, 100_000):
        h = HLL(12)
        h.add_hashes(splitmix64(np.arange(n, dtype=np.int64)))
        assert abs(h.estimate() - n) / n < 0.05, (n, h.estimate())


def test_hll_merge_equals_union():
    a, b, full = HLL(12), HLL(12), HLL(12)
    a.add_hashes(splitmix64(np.arange(0, 60_000, dtype=np.int64)))
    b.add_hashes(splitmix64(np.arange(30_000, 90_000, dtype=np.int64)))
    full.add_hashes(splitmix64(np.arange(90_000, dtype=np.int64)))
    a.merge(b)
    assert np.array_equal(a.registers, full.registers)


def test_hll_duplicates_do_not_inflate():
    h = HLL(12)
    for _ in range(5):
        h.add_hashes(splitmix64(np.arange(10_000, dtype=np.int64)))
    assert abs(h.estimate() - 10_000) / 10_000 < 0.05


def test_approx_distinct_dataset(ray_session):
    import ray.data

    n, dups = 50_000, 3
    ids = np.tile(np.arange(n, dtype=np.int64), dups)
    ds = ray.data.from_arrow(
        pa.table({"k_int": pa.array(ids), "k_str": pa.array([f"u{v}" for v in ids])})
    ).repartition(8)
    for col in ("k_int", "k_str"):
        est = approx_distinct(ds, col)
        assert abs(est - n) / n < 0.05, (col, est)


# ---------------------------------------------------------------- MG sketch


def test_frequent_items_exact_when_k_large(ray_session):
    import collections

    import numpy as np
    import ray.data

    from crawlray.ops.sketch import frequent_items

    rng = np.random.RandomState(3)
    vals = [f"u{int(v)}" for v in rng.zipf(1.7, 5000) % 40]
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(7)
    tbl, under = frequent_items(ds, "v", k=1000)
    got = dict(zip(tbl["item"].to_pylist(), tbl["est_count"].to_pylist()))
    assert under == 0
    assert got == dict(collections.Counter(vals))


def test_frequent_items_guarantee(ray_session):
    import collections

    import numpy as np
    import ray.data

    from crawlray.ops.sketch import frequent_items

    rng = np.random.RandomState(11)
    vals = [f"u{int(v)}" for v in rng.zipf(1.3, 20000) % 500]
    true = collections.Counter(vals)
    n = len(vals)
    k = 16
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(13)
    tbl, under = frequent_items(ds, "v", k=k)
    assert tbl.num_rows <= k
    assert under <= n // (k + 1)
    got = dict(zip(tbl["item"].to_pylist(), tbl["est_count"].to_pylist()))
    for it, est in got.items():
        assert est <= true[it]            # never overcounts
        assert true[it] - est <= under    # bounded undercount
    # every item above the n/(k+1) threshold must be present
    for it, c in true.items():
        if c > n // (k + 1) + under:
            assert it in got, f"heavy hitter {it} ({c}) missing"
