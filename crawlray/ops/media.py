"""Multimodal column plumbing (task brief: image/audio/video as opaque
binary columns with typed metadata; decode / feature-extract as actor-pool
map_batches stages).

The image/audio codec libraries are not in this container, so the DECODE
KERNEL is a clearly-marked deterministic stub (`_decode_stub`) — but the
Ray-side plumbing is real and exercised end-to-end: a `binary` payload
column flows through the object store, a stateful actor-pool stage
("codec loaded once per actor" in __init__) decodes per batch, and typed
metadata columns come out. Swapping `_decode_stub` for PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray.data


def attach_binary_payload(
    ds: ray.data.Dataset, id_col: str, text_col: str
) -> ray.data.Dataset:
    """Derive an opaque binary payload column (media_bytes) + mime tag.

    Stand-in for reading real media blobs: deterministic bytes from the text
    column so the downstream plumbing is content-addressable and testable.
    """

    def _bin(batch: pa.Table) -> pa.Table:
        payloads = [(t or "").encode("utf-8") for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "media_bytes": pa.array(payloads, pa.binary()),
                "mime": pa.array(["application/x-fake-image"] * batch.num_rows),
            }
        )

    return ds.map_batches(_bin, batch_format="pyarrow")


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decode — deterministic fake (width, height, checksum).

    A real deployment replaces this with e.g. PIL.Image.open(BytesIO(...));
    the libraries are unavailable in this environment (no network installs),
    so the stub keeps the stage's contract testable: output is a pure
    function of the payload bytes.
    """
    n = len(payload)
    return n % 640, n % 480, zlib.crc32(payload)


class MediaDecodeStage:
    """Actor-pool decode stage: 'codec' initialised once per actor
    (__init__), vectorized-ish decode per batch (__call__). Use with
    `ds.map_batches(MediaDecodeStage, concurrency=N, batch_size=B)` —
    small batches for large payloads (SURVEY.md memory-aware note)."""

    def __init__(self):
        self.codec = _decode_stub  # real codec handle would load here

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, checksums, sizes = [], [], [], []
        for payload in batch.column("media_bytes").to_pylist():
            w, h, c = self.codec(payload or b"")
            widths.append(w)
            heights.append(h)
            checksums.append(c)
            sizes.append(len(payload or b""))
        cols = {n: batch.column(n) for n in batch.column_names if n != "media_bytes"}
        cols.update(
            {
                "n_bytes": pa.array(sizes, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "checksum": pa.array(np.array(checksums, np.uint32), pa.uint32()),
            }
        )
        return pa.table(cols)


def decode_media(
    ds: ray.data.Dataset, id_col: str, text_col: str, concurrency: int = 2
) -> ray.data.Dataset:
    """Full multimodal pipeline: attach binary payload → actor-pool decode."""
    withbin = attach_binary_payload(ds, id_col, text_col)
    return withbin.map_batches(
        MediaDecodeStage,
        batch_format="pyarrow",
        batch_size=64,  # small batches: binary payloads dominate memory
        concurrency=concurrency,
        num_cpus=0.5,
    )
