"""Unit tests for the multimodal actor-pool stages (real PNG/GIF/JPEG
header decode + stub fallback, real plumbing — SURVEY.md task-brief
media ops)."""

from __future__ import annotations

import struct
import zlib

import pyarrow as pa

from crawlray.ops.media import (
    MediaDecodeStage,
    MediaFrameSampleStage,
    MediaResizeStage,
    parse_image_header,
)


def _png_bytes(w: int, h: int) -> bytes:
    """Minimal structurally-valid PNG: signature + IHDR + IEND."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )
    return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")


def _gif_bytes(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00;"


def _jpeg_bytes(w: int, h: int) -> bytes:
    """SOI + APP0 (skipped by the marker walk) + SOF0 carrying h/w."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11)
        + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_parse_image_header_real_formats():
    assert parse_image_header(_png_bytes(800, 600)) == (800, 600, "png")
    assert parse_image_header(_gif_bytes(320, 200)) == (320, 200, "gif")
    assert parse_image_header(_jpeg_bytes(1024, 768)) == (1024, 768, "jpeg")
    # non-image payloads fall through to the stub
    assert parse_image_header(b"plain text payload") is None
    assert parse_image_header(b"") is None
    # truncated signatures must not crash or false-positive
    assert parse_image_header(b"\x89PNG\r\n\x1a\n\x00\x00") is None
    assert parse_image_header(b"\xff\xd8\xff") is None


def test_decode_stage_real_bytes_through_actor_pool(ray_session):
    """End-to-end: real PNG/GIF/JPEG bytes in a binary column through the
    actor-pool decode stage — REAL dimensions out, stub only for raw."""
    import ray.data

    payloads = [
        _png_bytes(800, 600),
        _gif_bytes(320, 200),
        _jpeg_bytes(1024, 768),
        b"not an image at all",
    ]
    tbl = pa.table(
        {
            "doc_id": ["png1", "gif1", "jpg1", "raw1"],
            "media_bytes": pa.array(payloads, pa.binary()),
        }
    )
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(
            MediaDecodeStage, batch_format="pyarrow",
            batch_size=2, concurrency=2, num_cpus=0.5,
        )
        .take_all()
    )
    by_id = {r["doc_id"]: r for r in out}
    assert (by_id["png1"]["width"], by_id["png1"]["height"]) == (800, 600)
    assert by_id["png1"]["format"] == "png"
    assert (by_id["gif1"]["width"], by_id["gif1"]["height"]) == (320, 200)
    assert by_id["gif1"]["format"] == "gif"
    assert (by_id["jpg1"]["width"], by_id["jpg1"]["height"]) == (1024, 768)
    assert by_id["jpg1"]["format"] == "jpeg"
    raw = by_id["raw1"]
    n = len(b"not an image at all")
    assert raw["format"] == "raw"
    assert (raw["width"], raw["height"]) == (n % 640, n % 480)
    for r in out:
        assert r["checksum"] == zlib.crc32(
            payloads[["png1", "gif1", "jpg1", "raw1"].index(r["doc_id"])]
        )


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


def _wav_bytes(rate: int, channels: int, n_frames: int) -> bytes:
    """REAL WAV bytes via the stdlib wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * channels * n_frames)
    return buf.getvalue()


def test_audio_decode_real_wav_through_actor_pool(ray_session):
    """Real stdlib-generated WAV bytes through the actor-pool audio stage:
    sample rate / channels / frame count / duration decoded for real;
    non-audio payloads take the stub path."""
    import ray.data

    from crawlray.ops.media import AudioDecodeStage, parse_audio_header

    wav = _wav_bytes(16000, 2, 8000)
    assert parse_audio_header(wav) == (16000, 2, 8000, "wav")
    assert parse_audio_header(b"definitely not audio") is None
    assert parse_audio_header(b"RIFF\x00\x00\x00\x00JUNK") is None

    tbl = pa.table(
        {
            "doc_id": ["wav1", "wav2", "raw1"],
            "media_bytes": pa.array(
                [wav, _wav_bytes(44100, 1, 441), b"plain text"], pa.binary()
            ),
        }
    )
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(
            AudioDecodeStage, batch_format="pyarrow",
            batch_size=2, concurrency=2, num_cpus=0.5,
        )
        .take_all()
    )
    by_id = {r["doc_id"]: r for r in out}
    assert by_id["wav1"]["sample_rate"] == 16000
    assert by_id["wav1"]["channels"] == 2
    assert by_id["wav1"]["n_frames"] == 8000
    assert abs(by_id["wav1"]["duration_s"] - 0.5) < 1e-9
    assert by_id["wav1"]["format"] == "wav"
    assert by_id["wav2"]["sample_rate"] == 44100
    assert abs(by_id["wav2"]["duration_s"] - 0.01) < 1e-9
    assert by_id["raw1"]["format"] == "raw"
