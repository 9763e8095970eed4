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


class MediaResizeStage:
    """Actor-pool resize stage (stub kernel, real plumbing).

    Contract (pure integer arithmetic so the stage is oracle-checkable):
    images larger than `max_dim` on their longer side scale down to fit,
    preserving aspect ratio with floor division —
        scale applies iff max(width, height) > max_dim
        out_w = width  * max_dim // max(width, height)
        out_h = height * max_dim // max(width, height)
    A real deployment swaps the arithmetic for PIL `Image.resize` and
    re-encodes the payload; here the payload passes through untouched.
    Vectorized over the batch (numpy) — no per-row Python loop."""

    def __init__(self, max_dim: int = 256):
        self.max_dim = max_dim  # real codec/resampler handle would load here

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy().astype(np.int64)
        h = batch.column("height").to_numpy().astype(np.int64)
        longer = np.maximum(np.maximum(w, h), 1)
        need = longer > self.max_dim
        out_w = np.where(need, w * self.max_dim // longer, w)
        out_h = np.where(need, h * self.max_dim // longer, h)
        cols = {n: batch.column(n) for n in batch.column_names}
        cols["out_width"] = pa.array(out_w.astype(np.int32), pa.int32())
        cols["out_height"] = pa.array(out_h.astype(np.int32), pa.int32())
        return pa.table(cols)


class MediaFrameSampleStage:
    """Actor-pool frame-sampling stage for video-like payloads (stub).

    Contract: a payload of n_bytes holds `n_frames = n_bytes % 7 + 1`
    fake frames; every `stride`-th frame is emitted as its own ROW
    (doc explodes into frames — the output layout a real frame sampler
    produces), with `frame_off = frame_idx * (n_bytes // n_frames)` as the
    byte offset a real demuxer would seek to. Pure integer arithmetic →
    DuckDB-oracle-checkable; a real deployment swaps in ffmpeg seek+decode.
    """

    def __init__(self, stride: int = 2):
        self.stride = stride  # real demuxer handle would load here

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_bytes = batch.column("n_bytes").to_numpy().astype(np.int64)
        n_frames = n_bytes % 7 + 1
        counts = -(-n_frames // self.stride)  # frames sampled per doc
        rep_ids = np.repeat(ids, counts)
        rep_nb = np.repeat(n_bytes, counts)
        rep_nf = np.repeat(n_frames, counts)
        # frame_idx = stride * (rank within doc): global arange minus each
        # row's group start, vectorized
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        frame_idx = (np.arange(len(rep_ids)) - starts) * self.stride
        frame_off = frame_idx * (rep_nb // rep_nf)
        return pa.table(
            {
                "doc_id": pa.array(rep_ids),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "frame_off": pa.array(frame_off, pa.int64()),
            }
        )


def resize_media(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    max_dim: int = 256,
    concurrency: int = 2,
) -> ray.data.Dataset:
    """attach payload → decode → actor-pool resize (metadata contract)."""
    return decode_media(ds, id_col, text_col, concurrency).map_batches(
        MediaResizeStage,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        num_cpus=0.5,
        fn_constructor_kwargs={"max_dim": max_dim},
    )


def sample_frames(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    stride: int = 2,
    concurrency: int = 2,
) -> ray.data.Dataset:
    """attach payload → decode → explode into sampled frame rows."""
    return decode_media(ds, id_col, text_col, concurrency).map_batches(
        MediaFrameSampleStage,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        num_cpus=0.5,
        fn_constructor_kwargs={"stride": stride},
    )
