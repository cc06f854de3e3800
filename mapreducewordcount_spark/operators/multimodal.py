"""Multimodal column plumbing: image/audio/video as binary columns.

Extension scope (driver north star). The engine's contract for
multimodal data at 100 TB:

- payloads are opaque ``binary`` columns with *typed metadata*
  columns beside them (modality, format, width/height/duration) —
  never parsed strings;
- decode / feature-extraction runs as Arrow-batched ``mapInPandas``
  stages so the Python-side media libraries amortize per batch and
  memory is bounded by ``maxRecordsPerBatch``, not by partition size;
- partitioning for media work is by *byte budget*, not row count —
  ``repartition`` on a size-bucketed key keeps any single task's
  resident decoded set bounded.

The actual codec calls are STUBBED here (``Image.open``/ffmpeg are
not in this container): ``decode_image`` raises
``NotImplementedError`` unless given ``fake=True``, in which case a
deterministic fake decoder (seeded by payload hash) produces pixel
stats. Everything around the stub — schemas, batch iteration,
partitioning, UDF signatures — is real and tested, so swapping in a
real codec is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

#: decoded-feature schema produced by ``extract_image_features``
IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes int, format string, "
    "width int, height int, mean_r double, mean_g double, mean_b double"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode.

    Derives plausible dimensions and channel means from a sha256 of
    the payload — stable across runs/executors, so tests can assert
    exact values while the real codec is absent.
    """
    h = hashlib.sha256(payload).digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "mean_r": round(h[2] / 255.0, 6),
        "mean_g": round(h[3] / 255.0, 6),
        "mean_b": round(h[4] / 255.0, 6),
    }


def decode_image(payload: bytes, fmt: str, fake: bool = False) -> dict:
    """Decode one image payload to pixel stats.

    Real path requires an imaging library that is not shipped in this
    container; the plumbing is exercised with ``fake=True`` or by
    passing ``decoder=png_decode`` (a real pure-stdlib PNG decoder)
    to ``extract_image_features``.
    """
    if not fake:
        raise NotImplementedError(
            "general image codecs not available in this environment; "
            "pass fake=True, use png_decode for 8-bit RGB PNGs, or "
            "plug a real decoder here")
    return _fake_decode(payload)


def png_decode(payload: bytes, fmt: str = "png") -> dict:
    """REAL image decode, pure stdlib: 8-bit RGB non-interlaced PNG.

    Proves the ``extract_image_features`` decoder seam with an actual
    format parse (IHDR fields, zlib-inflated IDAT, all five scanline
    filter types per the PNG spec) rather than the deterministic
    fake — swapping in PIL/libjpeg later is the same one-function
    change. Scope is deliberately minimal (bit depth 8, color type 2,
    no interlace); anything else raises ``ValueError`` so bad inputs
    fail loudly instead of producing wrong stats.
    """
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, width, height, idat = 8, None, None, b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _, _, interlace = \
                struct.unpack(">IIBBBBB", data)
            if (depth, color, interlace) != (8, 2, 0):
                raise ValueError("png_decode supports 8-bit RGB "
                                 "non-interlaced only")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    raw = zlib.decompress(idat)
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    prev = bytearray(stride)
    sums = [0, 0, 0]
    off = 0
    for _ in range(height):
        ftype = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        off += 1 + stride
        if ftype:
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                if ftype == 1:
                    line[i] = (line[i] + a) & 0xFF
                elif ftype == 2:
                    line[i] = (line[i] + b) & 0xFF
                elif ftype == 3:
                    line[i] = (line[i] + (a + b) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else \
                        (b if pb <= pc else c)
                    line[i] = (line[i] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
        for i in range(0, stride, 3):
            sums[0] += line[i]
            sums[1] += line[i + 1]
            sums[2] += line[i + 2]
        prev = line
    n = width * height * 255.0
    return {"width": width, "height": height,
            "mean_r": round(sums[0] / n, 6),
            "mean_g": round(sums[1] / n, 6),
            "mean_b": round(sums[2] / n, 6)}


def extract_image_features(media: DataFrame, id_col: str = "media_id",
                           payload_col: str = "payload",
                           format_col: str = "format",
                           fake: bool = True,
                           decoder=None) -> DataFrame:
    """binary payloads → per-image feature rows (Arrow-batched).

    The decoder initializes once per Python worker, outside the batch
    loop; each Arrow batch is decoded row-wise but transferred
    column-wise. Output is a flat feature schema ready for
    DataFrame-side filtering/joining (e.g. drop tiny images before an
    expensive embedding stage).

    ``decoder`` is the swap seam: any ``(payload: bytes, fmt: str) ->
    dict`` callable (must be picklable — module-level function). Ships
    with two implementations: the deterministic fake (default,
    ``fake=True``) and ``png_decode`` (real pure-stdlib PNG decode).
    """
    if decoder is None:
        def decoder(payload, fmt, _fake=fake):  # noqa: ANN001
            return decode_image(payload, fmt, fake=_fake)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload, fmt in zip(pdf[id_col], pdf[payload_col],
                                         pdf[format_col]):
                d = decoder(bytes(payload), fmt)
                out.append({"media_id": mid, "n_bytes": len(payload),
                            "format": fmt, **d})
            yield pd.DataFrame(out, columns=[
                "media_id", "n_bytes", "format", "width", "height",
                "mean_r", "mean_g", "mean_b"])

    return media.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def size_bucketed(media: DataFrame, payload_col: str = "payload",
                  target_bytes_per_task: int = 64 * 1024 * 1024) -> DataFrame:
    """Repartition media rows so each task decodes a bounded byte budget.

    Media rows are wildly skewed in size (a 4 KB thumbnail vs a 40 MB
    scan); row-count partitioning lets one task eat all the big rows.
    Bucketing on cumulative-size-independent random-ish key derived
    from payload hash + size class spreads large payloads uniformly.
    """
    n = media.sparkSession.sparkContext.defaultParallelism
    size_class = (F.log2(F.length(payload_col).cast("double") + 1)).cast("int")
    key = F.concat_ws("#", size_class,
                      F.pmod(F.xxhash64(payload_col), F.lit(n)))
    return media.repartition(n, key)


def sample_video_frames(media: DataFrame, every_n: int = 30,
                        id_col: str = "media_id",
                        payload_col: str = "payload") -> DataFrame:
    """Video → sampled frame rows (stubbed frame extraction).

    Emits (media_id, frame_index, frame_payload) with frame payloads
    sliced deterministically from the container bytes — the real
    implementation replaces the slicer with an ffmpeg call; the
    explode shape (one row in, many rows out via mapInPandas) and
    downstream schema stay identical.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                n_frames = max(1, len(payload) // (every_n * 16))
                for i in range(n_frames):
                    start = (i * every_n * 16) % max(1, len(payload))
                    out.append({"media_id": mid, "frame_index": i,
                                "frame_payload": payload[start:start + 16]})
            yield pd.DataFrame(out, columns=["media_id", "frame_index",
                                             "frame_payload"])

    return media.mapInPandas(
        run, schema="media_id long, frame_index int, frame_payload binary")
