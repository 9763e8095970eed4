"""Shared block-level utilities for the operator library."""

from __future__ import annotations

import pyarrow as pa
import ray.data


def drop_empty_blocks(
    mat: ray.data.Dataset, schema: pa.Schema | None = None
) -> ray.data.Dataset:
    """Scrub the zero-column empty blocks `groupby().map_groups()` emits
    for empty hash partitions (Ray writes them without calling the UDF, so
    they carry NO schema and later poison Acero joins with "No match for
    key field"). Metadata-only: walks the materialized block refs and
    rebuilds from the non-empty ones — no block is fetched to the driver.

    `schema`: the caller's expected output schema. When EVERY block is
    empty (a legitimately empty join/group result) there is no non-empty
    ref to rebuild from; with a schema we return a 0-row dataset carrying
    it, so downstream Acero joins see real key fields instead of the
    schema-less poison blocks. Without one, the input passes through
    unchanged (old behavior).

    The input must already be materialized (every hash-shuffle caller
    materializes anyway to cut the lazy re-execution of its exchange).
    """
    bundles = list(mat.iter_internal_ref_bundles())
    refs, total = [], 0
    for b in bundles:
        for ref, meta in b.blocks:
            total += 1
            if (meta.num_rows or 0) > 0:
                refs.append(ref)
    if not refs:
        if schema is not None:
            return ray.data.from_arrow(schema.empty_table())
        return mat
    if len(refs) == total:
        return mat
    return ray.data.from_arrow_refs(refs)
