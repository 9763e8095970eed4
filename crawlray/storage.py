"""Storage backend abstraction (SURVEY.md O-47).

The north rule targets Lance-backed document tables; `pylance` is NOT
installed in this sandbox and cannot be installed (no network — SURVEY.md
§0), so storage is an interchangeable backend: Lance when importable,
Parquet otherwise, identical logical layout either way. Engine code paths
go through these helpers rather than importing lance directly, so a
Lance-capable environment switches by default without code changes.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


DEFAULT_FORMAT = "lance" if lance_available() else "parquet"


def write_table(table: pa.Table, path: str, fmt: str | None = None) -> str:
    """Write one Arrow table; returns the concrete path written."""
    fmt = fmt or DEFAULT_FORMAT
    if fmt == "lance":
        import lance

        uri = path if path.endswith(".lance") else path + ".lance"
        lance.write_dataset(table, uri, mode="overwrite")
        return uri
    uri = path if path.endswith(".parquet") else path + ".parquet"
    os.makedirs(os.path.dirname(uri) or ".", exist_ok=True)
    pq.write_table(table, uri)
    return uri


def read_table(path: str, columns: list[str] | None = None) -> pa.Table:
    if path.endswith(".lance"):
        import lance

        return lance.dataset(path).to_table(columns=columns)
    return pq.read_table(path, columns=columns)


def write_dataset(ds, path: str, fmt: str | None = None) -> None:
    """Write a ray.data.Dataset (distributed write — one file per block)."""
    fmt = fmt or DEFAULT_FORMAT
    if fmt == "lance":
        ds.write_lance(path)  # ray.data native Lance sink (needs pylance)
    else:
        ds.write_parquet(path)


def read_dataset(path: str, columns: list[str] | None = None):
    import ray.data

    if path.endswith(".lance") or (
        os.path.isdir(path) and any(f.endswith(".lance") for f in os.listdir(path))
    ):
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)
