"""Storage backend abstraction (O-47): parquet fallback active in this
sandbox; lance path gated behind import."""

import pyarrow as pa

from crawlray import storage


def test_backend_selection_and_roundtrip(tmp_path):
    # this sandbox has no pylance (SURVEY.md §0) — fallback must be parquet
    assert storage.DEFAULT_FORMAT == "parquet"
    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    p = storage.write_table(t, str(tmp_path / "t"))
    assert p.endswith(".parquet")
    back = storage.read_table(p)
    assert back.equals(t)
    assert storage.read_table(p, columns=["b"]).column_names == ["b"]


def test_dataset_roundtrip(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_items([{"x": i} for i in range(10)])
    storage.write_dataset(ds, str(tmp_path / "d"))
    back = storage.read_dataset(str(tmp_path / "d"))
    assert back.count() == 10


def test_resumable_write_skips_committed_partitions(ray_session, tmp_path):
    """Crash-resume semantics: committed partitions are skipped untouched,
    unmarked ones are rewritten, and the final dataset is identical to a
    single clean run — at any parallelism."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from crawlray.storage import resumable_write

    ids = [f"u-{i:04d}" for i in range(1000)]
    tbl = pa.table({"uid": ids, "v": list(range(1000))})
    out1 = str(tmp_path / "clean")
    m1 = resumable_write(ray.data.from_arrow(tbl), out1, "uid", num_partitions=8)
    assert m1.num_rows == 8
    assert not any(m1.column("skipped").to_pylist())
    assert sum(m1.column("rows").to_pylist()) == 1000

    def read_all(root):
        parts = []
        for d in sorted(os.listdir(root)):
            f = os.path.join(root, d, "data.parquet")
            parts.append(pq.read_table(f))
        t = pa.concat_tables(parts)
        return sorted(zip(t.column("uid").to_pylist(), t.column("v").to_pylist()))

    want = read_all(out1)
    assert len(want) == 1000

    # simulate a crash: copy two committed partitions + leave junk without
    # a marker in a third, then "resume" into that directory
    out2 = str(tmp_path / "crashed")
    os.makedirs(out2)
    import shutil

    shutil.copytree(os.path.join(out1, "part=0"), os.path.join(out2, "part=0"))
    shutil.copytree(os.path.join(out1, "part=3"), os.path.join(out2, "part=3"))
    os.makedirs(os.path.join(out2, "part=5"))
    with open(os.path.join(out2, "part=5", ".data.tmp"), "w") as f:
        f.write("junk from a crashed writer")  # no _SUCCESS marker

    mtime0 = os.path.getmtime(os.path.join(out2, "part=0", "data.parquet"))
    m2 = resumable_write(
        ray.data.from_arrow(tbl).repartition(7), out2, "uid", num_partitions=8
    )
    sk = {r["part"]: r["skipped"] for r in m2.to_pylist()}
    assert sk[0] and sk[3]
    assert not sk[5]
    # committed partitions were NOT rewritten (mtime unchanged)
    assert os.path.getmtime(os.path.join(out2, "part=0", "data.parquet")) == mtime0
    # the resumed directory equals the clean run bit-for-bit in content
    assert read_all(out2) == want
