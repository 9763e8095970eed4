"""Unit tests for the multimodal actor-pool stages (stub kernels, real
plumbing — SURVEY.md task-brief media ops)."""

from __future__ import annotations

import pyarrow as pa

from crawlray.ops.media import MediaFrameSampleStage, MediaResizeStage


def test_resize_contract():
    batch = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "width": pa.array([640, 100, 512, 0], pa.int32()),
            "height": pa.array([480, 50, 512, 0], pa.int32()),
        }
    )
    out = MediaResizeStage(max_dim=256)(batch)
    # 640x480 → longer side 640 → (640*256//640, 480*256//640) = (256, 192)
    assert out.column("out_width").to_pylist() == [256, 100, 256, 0]
    assert out.column("out_height").to_pylist() == [192, 50, 256, 0]


def test_frame_sample_explode():
    batch = pa.table(
        {
            "doc_id": [10, 20, 30],
            # n_frames = n_bytes % 7 + 1 → 5, 1, 7
            "n_bytes": pa.array([704, 7, 13], pa.int64()),
        }
    )
    out = MediaFrameSampleStage(stride=2)(batch)
    rows = list(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("frame_idx").to_pylist(),
            out.column("frame_off").to_pylist(),
        )
    )
    # doc 10: 5 frames, stride 2 → idx 0,2,4; off = idx * (704 // 5 = 140)
    # doc 20: 1 frame → idx 0; doc 30: 7 frames → idx 0,2,4,6, off = idx*1
    assert rows == [
        (10, 0, 0), (10, 2, 280), (10, 4, 560),
        (20, 0, 0),
        (30, 0, 0), (30, 2, 2), (30, 4, 4), (30, 6, 6),
    ]
