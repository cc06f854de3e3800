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
    container; the plumbing is exercised with ``fake=True``.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "pass fake=True or plug a real decoder here")
    return _fake_decode(payload)


def extract_image_features(media: DataFrame, id_col: str = "media_id",
                           payload_col: str = "payload",
                           format_col: str = "format",
                           fake: bool = True) -> DataFrame:
    """binary payloads → per-image feature rows (Arrow-batched).

    The decoder initializes once per Python worker, outside the batch
    loop; each Arrow batch is decoded row-wise but transferred
    column-wise. Output is a flat feature schema ready for
    DataFrame-side filtering/joining (e.g. drop tiny images before an
    expensive embedding stage).
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload, fmt in zip(pdf[id_col], pdf[payload_col],
                                         pdf[format_col]):
                d = decode_image(bytes(payload), fmt, fake=fake)
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
