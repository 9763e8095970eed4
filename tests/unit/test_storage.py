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
