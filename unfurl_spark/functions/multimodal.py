"""Multimodal column operators — decode / feature-extract / resize /
frame-sample over opaque ``binary`` payload columns.

Mirrors the reference's media path (its exif/exiftool plugins,
packages/unfurl-exif/src/index.ts:16-47 and
packages/unfurl-exiftool/src/index.ts:25-86, read container *headers*)
and extends it with the operations a training-data pipeline needs over
image/audio/video payloads at 100 TB.

Spark-side plumbing (schemas, salt partitioning, Arrow batch shape,
byte caps) is REAL and tested.  Full pixel/sample decode requires
image/audio codecs that are not installed in this environment, so the
decode kernel is a clearly-marked STUB: container metadata comes from
the real header parsers in ``media.py``; pixel-level outputs are a
deterministic fake derived from the payload hash (stable across runs
and workers, so downstream tests are exact), and ``decode_pixels``
raises ``NotImplementedError`` to mark the codec boundary.

All operators are Arrow-batched via ``mapInArrow`` — no per-row Python
UDFs, payloads cross as Arrow binary buffers (zero-copy from the JVM).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .media import _png_info, _sniff, _webp_info, mp4_metadata

# cap payload bytes entering Python — headers live in the prefix (the
# reference caps EXIF reads at 131072, unfurl-exif/src/index.ts:21)
HEADER_BYTE_CAP = 131072

DECODE_SCHEMA = ("media_ref string, container string, width int, "
                 "height int, n_bytes long, ok string")
FEATURE_SCHEMA = "media_ref string, embedding array<float>"
RESIZE_SCHEMA = ("media_ref string, width int, height int, "
                 "payload binary, ok string")
FRAME_SCHEMA = ("media_ref string, frame_index int, frame_ts_ms long, "
                "payload binary")


def decode_pixels(payload: bytes, container: str):
    """The codec boundary.  A real deployment plugs Pillow/ffmpeg in
    here; this environment has neither, so the boundary is explicit."""
    raise NotImplementedError(
        "pixel/sample decode requires an image/audio codec library "
        "(not installed); deterministic fake used instead")


def _fake_pixels(media_ref: str, payload: bytes, n: int) -> bytes:
    """Deterministic stand-in for decoded pixel data: an n-byte stream
    seeded by (media_ref, payload) — stable across runs/workers."""
    seed = hashlib.sha256(media_ref.encode() + b"\x00" + payload[:64])
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hashlib.sha256(seed.digest() + struct.pack("<q", counter)
                              ).digest()
        counter += 1
    return bytes(out[:n])


def _dims(container: str | None, data: bytes):
    if container == "png":
        w, h, _, _ = _png_info(data)
        return w, h
    if container == "webp":
        w, h, _, _ = _webp_info(data)
        return w, h
    if container == "jpeg":
        # SOFn scan (real header walk, no codec needed)
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (struct.unpack(">H", data[i + 7:i + 9])[0],
                        struct.unpack(">H", data[i + 5:i + 7])[0])
            seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
            i += 2 + seg_len
        return None, None
    if container == "mp4":
        meta = mp4_metadata(data)
        return meta.get("width"), meta.get("height")
    return None, None


def _salted(df: DataFrame, num_partitions: int | None):
    if num_partitions:
        return df.repartition(num_partitions, F.xxhash64("media_ref"))
    return df


def decode_media(df: DataFrame,
                 num_partitions: int | None = None) -> DataFrame:
    """(media_ref, ctype, payload) → container + dimensions + lineage.

    Header metadata is real (magic-byte sniff + PNG/WebP/JPEG header
    walk); anything needing a codec records ok='stub:NotImplementedError'.
    """
    capped = df.select(
        "media_ref",
        F.substring("payload", 1, HEADER_BYTE_CAP).alias("head"),
        F.length("payload").cast("long").alias("n_bytes"),
    )

    def run(batches: Iterator) -> Iterator:
        import pyarrow as pa
        for batch in batches:
            refs = batch.column(0).to_pylist()
            heads = batch.column(1).to_pylist()
            sizes = batch.column(2).to_pylist()
            containers, widths, heights, oks = [], [], [], []
            for ref, head, _n in zip(refs, heads, sizes):
                data = head or b""
                c = _sniff(data)
                w, h = _dims(c, data)
                try:
                    decode_pixels(data, c or "unknown")
                    ok = "ok"
                except NotImplementedError:
                    ok = "stub:NotImplementedError"
                containers.append(c)
                widths.append(w)
                heights.append(h)
                oks.append(ok)
            yield pa.RecordBatch.from_arrays(
                [pa.array(refs, pa.string()),
                 pa.array(containers, pa.string()),
                 pa.array(widths, pa.int32()),
                 pa.array(heights, pa.int32()),
                 pa.array(sizes, pa.int64()),
                 pa.array(oks, pa.string())],
                names=["media_ref", "container", "width", "height",
                       "n_bytes", "ok"])

    return _salted(capped, num_partitions).mapInArrow(run, DECODE_SCHEMA)


def extract_features(df: DataFrame, dim: int = 64,
                     num_partitions: int | None = None) -> DataFrame:
    """(media_ref, payload) → dense float feature vector.

    Plumbing real (Arrow batches, fixed-dim array<float> schema);
    the feature math is the deterministic stub (payload-hash pixels →
    byte histogram → L2-normalized), since real embeddings need a
    vision model.
    """
    capped = df.select(
        "media_ref", F.substring("payload", 1, 4096).alias("head"))

    def run(batches: Iterator) -> Iterator:
        import math

        import pyarrow as pa
        for batch in batches:
            refs = batch.column(0).to_pylist()
            heads = batch.column(1).to_pylist()
            vecs = []
            for ref, head in zip(refs, heads):
                px = _fake_pixels(ref, head or b"", dim * 16)
                hist = [0.0] * dim
                for i, b in enumerate(px):
                    hist[i % dim] += b / 255.0
                norm = math.sqrt(sum(v * v for v in hist)) or 1.0
                vecs.append([v / norm for v in hist])
            yield pa.RecordBatch.from_arrays(
                [pa.array(refs, pa.string()),
                 pa.array(vecs, pa.list_(pa.float32()))],
                names=["media_ref", "embedding"])

    return _salted(capped, num_partitions).mapInArrow(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int = 64, height: int = 64,
                  num_partitions: int | None = None) -> DataFrame:
    """(media_ref, payload) → fixed-size "pixel" buffer (w*h*3 bytes).

    Output schema/batch shape is exactly what a Pillow-backed resize
    would produce; the pixel content is the deterministic stub.
    """
    n_out = width * height * 3

    def run(batches: Iterator) -> Iterator:
        import pyarrow as pa
        for batch in batches:
            refs = batch.column(0).to_pylist()
            payloads = batch.column(1).to_pylist()
            outs, oks = [], []
            for ref, payload in zip(refs, payloads):
                data = payload or b""
                try:
                    decode_pixels(data, "unknown")
                    oks.append("ok")
                except NotImplementedError:
                    oks.append("stub:NotImplementedError")
                outs.append(_fake_pixels(ref, data, n_out))
            yield pa.RecordBatch.from_arrays(
                [pa.array(refs, pa.string()),
                 pa.array([width] * len(refs), pa.int32()),
                 pa.array([height] * len(refs), pa.int32()),
                 pa.array(outs, pa.binary()),
                 pa.array(oks, pa.string())],
                names=["media_ref", "width", "height", "payload", "ok"])

    return _salted(df.select("media_ref", "payload"),
                   num_partitions).mapInArrow(run, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4,
                  frame_interval_ms: int = 1000,
                  num_partitions: int | None = None) -> DataFrame:
    """(media_ref, payload) → n_frames rows per video (1→N batch shape).

    Frame timestamps are REAL when the container declares a duration
    (mp4 moov/mvhd via media.mp4_metadata): frames spread evenly across
    the clip, exactly like an `ffmpeg -vf fps=` sampler; containers with
    no parseable duration fall back to the fixed interval.  Frame pixel
    payloads remain the deterministic stub (codec boundary).
    """

    def run(batches: Iterator) -> Iterator:
        import pyarrow as pa
        for batch in batches:
            refs = batch.column(0).to_pylist()
            payloads = batch.column(1).to_pylist()
            o_refs, o_idx, o_ts, o_payload = [], [], [], []
            for ref, payload in zip(refs, payloads):
                data = payload or b""
                duration_s = mp4_metadata(data).get("duration_s")
                if duration_s:
                    step_ms = max(1, int(duration_s * 1000 / n_frames))
                else:
                    step_ms = frame_interval_ms
                for i in range(n_frames):
                    o_refs.append(ref)
                    o_idx.append(i)
                    o_ts.append(i * step_ms)
                    o_payload.append(
                        _fake_pixels(f"{ref}#{i}", data, 256))
            yield pa.RecordBatch.from_arrays(
                [pa.array(o_refs, pa.string()),
                 pa.array(o_idx, pa.int32()),
                 pa.array(o_ts, pa.int64()),
                 pa.array(o_payload, pa.binary())],
                names=["media_ref", "frame_index", "frame_ts_ms",
                       "payload"])

    return _salted(df.select("media_ref", "payload"),
                   num_partitions).mapInArrow(run, FRAME_SCHEMA)
