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


def png_decode_pixels(payload: bytes) -> tuple[int, int, bytearray]:
    """REAL image decode, pure stdlib: 8-bit RGB non-interlaced PNG
    → ``(width, height, rgb_rows)`` with ``rgb_rows`` a flat
    row-major RGB byte buffer.

    Actual format parse: IHDR fields, zlib-inflated IDAT, all five
    scanline filter types per the PNG spec. Scope is deliberately
    minimal (bit depth 8, color type 2, no interlace); anything else
    raises ``ValueError`` so bad inputs fail loudly instead of
    producing wrong pixels.
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
    import numpy as np

    raw = zlib.decompress(idat)
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    # rows are [filter_byte | stride bytes]; unfilter with numpy:
    # None (0) is a copy, Sub (1) is a per-lane cumsum mod 256
    # (out[i] = raw[i] + out[i-3] telescopes, and mod distributes
    # over the sum), Up (2) is one vectorized add against the
    # previous decoded row. Average (3) and Paeth (4) carry a true
    # left-dependency (the predictor reads the DECODED left byte,
    # with a floor-div / branch in between — not expressible as a
    # scan), so those rows fall back to the byte loop; filter-0/1/2
    # rows — everything our encoder emits and the bulk of real
    # encoder output — decode at numpy speed.
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = arr[:, 0]
    if not np.all(ftypes <= 4):
        bad = int(ftypes[ftypes > 4][0])
        raise ValueError(f"bad PNG filter type {bad}")
    out_rows = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(ftypes[y])
        line = arr[y, 1:]
        if ftype == 0:
            cur = line.copy()
        elif ftype == 1:
            cur = (line.reshape(width, 3).astype(np.uint64)
                   .cumsum(axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif ftype == 2:
            cur = line + prev  # uint8 addition wraps mod 256 natively
        else:  # 3 (Average) / 4 (Paeth): sequential left-dependency
            cur_b = bytearray(line.tobytes())
            prev_b = prev.tobytes()
            for i in range(stride):
                a = cur_b[i - 3] if i >= 3 else 0
                b = prev_b[i]
                if ftype == 3:
                    cur_b[i] = (cur_b[i] + (a + b) // 2) & 0xFF
                else:
                    c = prev_b[i - 3] if i >= 3 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else \
                        (b if pb <= pc else c)
                    cur_b[i] = (cur_b[i] + pred) & 0xFF
            cur = np.frombuffer(bytes(cur_b), dtype=np.uint8)
        out_rows[y] = cur
        prev = cur
    return width, height, bytearray(out_rows.tobytes())


def png_encode(width: int, height: int, rgb: bytes) -> bytes:
    """REAL image encode, pure stdlib: flat RGB rows → 8-bit RGB
    non-interlaced PNG (filter type 0 per scanline, one zlib IDAT).

    The inverse seam of ``png_decode_pixels`` — together they make
    decode → transform → re-encode stages (``resize_images``) fully
    real in this codec-less container.
    """
    import struct
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer size does not match dimensions")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    import numpy as np

    stride = width * 3
    # filter byte 0 prepended per scanline — one numpy column stack
    # instead of a per-row Python append loop
    rows = np.frombuffer(bytes(rgb), dtype=np.uint8).reshape(height, stride)
    raw = np.hstack(
        [np.zeros((height, 1), dtype=np.uint8), rows]).tobytes()
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def resize_rgb_nearest(width: int, height: int, rgb: bytes,
                       out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of a flat RGB buffer (src index =
    ``floor(dst_index * src / dst)``, the standard NN mapping) —
    one numpy fancy-index gather, no per-pixel Python loop."""
    import numpy as np

    arr = np.frombuffer(bytes(rgb), dtype=np.uint8).reshape(
        height, width, 3)
    sy = (np.arange(out_h, dtype=np.int64) * height) // out_h
    sx = (np.arange(out_w, dtype=np.int64) * width) // out_w
    return arr[np.ix_(sy, sx)].tobytes()


def png_decode(payload: bytes, fmt: str = "png") -> dict:
    """REAL image decode to pixel stats (see ``png_decode_pixels``
    for the parse; this wrapper reduces pixels to the
    ``IMAGE_FEATURES_SCHEMA`` channel means)."""
    import numpy as np

    width, height, px = png_decode_pixels(payload)
    # integer channel sums (exact, like the loop this replaced) then
    # one float division — no per-pixel Python arithmetic
    sums = np.frombuffer(bytes(px), dtype=np.uint8) \
        .reshape(width * height, 3).sum(axis=0, dtype=np.int64)
    n = width * height * 255.0
    return {"width": width, "height": height,
            "mean_r": round(int(sums[0]) / n, 6),
            "mean_g": round(int(sums[1]) / n, 6),
            "mean_b": round(int(sums[2]) / n, 6)}


def resize_images(media: DataFrame, out_w: int, out_h: int,
                  id_col: str = "media_id",
                  payload_col: str = "payload") -> DataFrame:
    """PNG payloads → resized PNG payloads (Arrow-batched, REAL).

    The brief's "resize" stage as an actual decode → nearest-neighbor
    resample → re-encode pipeline over ``mapInPandas`` — binary in,
    binary out, so it composes with ``size_bucketed`` upstream and
    ``extract_image_features`` downstream exactly like any media
    transform would at 100 TB (narrow map, no shuffle; memory bounded
    by Arrow batch size × decoded image size).
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:  # NULL image → no output row
                    continue
                w, h, px = png_decode_pixels(bytes(payload))
                resized = resize_rgb_nearest(w, h, px, out_w, out_h)
                out.append({id_col: mid,
                            payload_col: png_encode(out_w, out_h, resized),
                            "width": out_w, "height": out_h})
            yield pd.DataFrame(out, columns=[id_col, payload_col,
                                             "width", "height"])

    # output id/payload columns keep the CALLER's names — a
    # doc_id-keyed media frame stays doc_id-keyed through the resize
    return media.mapInPandas(
        run, schema=f"{id_col} long, {payload_col} binary, "
                    "width int, height int")


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
                if payload is None:  # NULL image → no feature row
                    continue
                d = decoder(bytes(payload), fmt)
                out.append({id_col: mid, "n_bytes": len(payload),
                            "format": fmt, **d})
            yield pd.DataFrame(out, columns=[
                id_col, "n_bytes", "format", "width", "height",
                "mean_r", "mean_g", "mean_b"])

    # the id column keeps the caller's name (IMAGE_FEATURES_SCHEMA
    # documents the default media_id contract)
    return media.mapInPandas(
        run, schema=f"{id_col} long, n_bytes int, format string, "
                    "width int, height int, "
                    "mean_r double, mean_g double, mean_b double")


#: decoded-feature schema produced by ``extract_audio_features``
AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes int, sample_rate int, n_channels int, "
    "n_samples long, duration_s double, rms double, zcr double"
)


def image_dhash(payload: bytes) -> int:
    """Perceptual difference hash (dHash) of a PNG payload.

    The classic near-dup signature for images: decode (REAL stdlib
    PNG parse), luma-grayscale, nearest-neighbor downsample to 9x8,
    then one bit per adjacent-pixel comparison (left < right) packed
    row-major into a signed 64-bit value. Because every bit is a
    LOCAL intensity comparison, the hash is invariant under any
    monotone per-pixel brightness shift and robust to small content
    edits — unlike a byte hash, which any re-encode breaks.

    Pairs within a small Hamming radius are near-duplicate images;
    feed the signatures to ``operators.dedup.signature_hamming_pairs``
    (the same banded pigeonhole join SimHash uses).
    """
    import numpy as np

    w, h, rgb = png_decode_pixels(payload)
    small = resize_rgb_nearest(w, h, rgb, 9, 8)
    a = np.frombuffer(small, np.uint8).reshape(8, 9, 3).astype(np.int32)
    gray = (a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114) // 1000
    bits = (gray[:, 1:] > gray[:, :-1]).flatten()
    v = 0
    for i, b in enumerate(bits):
        v |= int(b) << i
    return v - (1 << 64) if v >= (1 << 63) else v


def extract_image_dhash(media: DataFrame, id_col: str = "media_id",
                        payload_col: str = "payload") -> DataFrame:
    """binary PNG payloads → (id, dhash long), Arrow-batched.

    Same narrow ``mapInPandas`` shape as the feature extractors:
    per-task memory is one Arrow batch of payloads plus one decoded
    image at a time; chain after ``size_bucketed`` so no task eats a
    skewed byte budget. Output is 8 bytes per image — the signature
    table is what shuffles in the pair join, never pixels.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:  # NULL image → no signature row
                    continue
                out.append({id_col: mid,
                            "dhash": image_dhash(bytes(payload))})
            yield pd.DataFrame(out, columns=[id_col, "dhash"])

    return media.mapInPandas(run, schema=f"{id_col} long, dhash long")


def wav_encode_pcm(samples: bytes, sample_rate: int = 8000) -> bytes:
    """REAL audio encode, pure stdlib: mono 8-bit PCM RIFF/WAVE.

    Canonical 44-byte header (RIFF size, ``fmt `` with PCM tag 1,
    ``data``) followed by unsigned 8-bit samples. Used by tests and
    the gate query to manufacture genuine WAV containers from
    deterministic byte streams; ``wav_decode`` must then parse them
    for real — no shared shortcut between the two directions.
    """
    import struct

    n = len(samples)
    hdr = (b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                   sample_rate, 1, 8)
           + b"data" + struct.pack("<I", n))
    return hdr + samples


def wav_decode(payload: bytes) -> dict:
    """REAL audio decode, pure stdlib + numpy: PCM RIFF/WAVE.

    Proves the audio leg of the multimodal seam with an actual
    container parse — RIFF magic, chunk walk (unknown chunks skipped
    per spec, word-aligned), ``fmt `` fields, ``data`` payload — and
    real DSP over the samples: normalized RMS and zero-crossing rate
    (fraction of adjacent sample pairs whose centered sign differs).
    Supports PCM (format tag 1) at 8-bit unsigned and 16-bit signed
    LE, mono or interleaved multi-channel (channels are averaged to
    one lane before the stats, the usual mono-downmix). Anything else
    raises ``ValueError`` so bad inputs fail loudly. Container
    parsing + downmix live in ``_wav_mono_samples`` (shared with
    ``audio_fingerprint``).
    """
    rate, n_ch, x, scale = _wav_mono_samples(payload)
    import numpy as np

    n_frames = x.size
    rms = float(np.sqrt(np.mean((x / scale) ** 2))) if n_frames else 0.0
    if n_frames > 1:
        sign = x >= 0
        zcr = float(np.count_nonzero(sign[1:] != sign[:-1])) / (n_frames - 1)
    else:
        zcr = 0.0

    def r6(v: float) -> float:
        # HALF-UP at 6dp, matching Spark's F.round and DuckDB round()
        # — Python's built-in round is banker's, which flips exact
        # halves the other way (8-bit PCM hits them: 1/128 = .0078125)
        import math

        return math.floor(v * 1e6 + 0.5) / 1e6

    return {"sample_rate": int(rate), "n_channels": int(n_ch),
            "n_samples": int(n_frames),
            "duration_s": r6(n_frames / rate) if rate else 0.0,
            "rms": r6(rms), "zcr": r6(zcr)}


def _wav_mono_samples(payload: bytes):
    """RIFF/WAVE parse + mono downmix shared by ``wav_decode`` and
    ``audio_fingerprint``: returns ``(rate, n_channels, mono_samples
    float64 ndarray, fullscale)``. Same loud-failure contract as
    ``wav_decode`` (truncated chunk / non-PCM / missing chunks raise)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if pos + 8 + length > len(payload):
            # a silently-clamped slice would yield WRONG stats from a
            # truncated/corrupt container; the module contract is to
            # fail loudly instead
            raise ValueError(
                f"truncated WAV chunk {cid!r}: declares {length} bytes "
                f"but only {len(payload) - pos - 8} remain")
        body = payload[pos + 8:pos + 8 + length]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, n_ch, rate, _, _, bits = fmt
    if tag != 1 or n_ch < 1 or bits not in (8, 16):
        raise ValueError(f"wav_decode supports PCM 8/16-bit only, "
                         f"got tag={tag} bits={bits}")
    if bits == 8:
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        scale = 128.0
    else:
        n_even = len(data) // 2 * 2
        x = np.frombuffer(data[:n_even], dtype="<i2").astype(np.float64)
        scale = 32768.0
    n_frames = x.size // n_ch
    x = x[:n_frames * n_ch].reshape(n_frames, n_ch).mean(axis=1)
    return int(rate), int(n_ch), x, scale


def audio_fingerprint(payload: bytes, n_bands: int = 65) -> int:
    """Perceptual audio fingerprint: sign of frame-energy deltas.

    The audio analog of ``image_dhash``: split the mono-downmixed
    clip into ``n_bands`` equal index frames, take each frame's
    energy, and emit one bit per adjacent-frame comparison
    (energy[i+1] > energy[i]) packed into a signed 64-bit value.
    Every bit is a LOCAL energy comparison, so the fingerprint is
    invariant under uniform volume scaling and robust to small
    edits — pair signatures with
    ``operators.dedup.signature_hamming_pairs``. Empty clip → 0.
    """
    import numpy as np

    _, _, x, scale = _wav_mono_samples(payload)
    if x.size == 0:
        return 0
    idx = (np.arange(x.size, dtype=np.int64) * n_bands) // x.size
    energy = np.bincount(idx, weights=(x / scale) ** 2,
                         minlength=n_bands)
    bits = energy[1:] > energy[:-1]
    v = 0
    for i, b in enumerate(bits[:64]):
        v |= int(b) << i
    return v - (1 << 64) if v >= (1 << 63) else v


def extract_audio_fingerprints(media: DataFrame, id_col: str = "media_id",
                               payload_col: str = "payload") -> DataFrame:
    """binary WAV payloads → (id, fingerprint long), Arrow-batched —
    the audio twin of ``extract_image_dhash``: 8 bytes out per clip,
    so only the signature table ever shuffles."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:  # NULL clip → no signature row
                    continue
                out.append({id_col: mid,
                            "fingerprint": audio_fingerprint(bytes(payload))})
            yield pd.DataFrame(out, columns=[id_col, "fingerprint"])

    return media.mapInPandas(run, schema=f"{id_col} long, fingerprint long")


def extract_audio_features(media: DataFrame, id_col: str = "media_id",
                           payload_col: str = "payload",
                           decoder=wav_decode) -> DataFrame:
    """binary WAV payloads → per-clip feature rows (Arrow-batched).

    Mirror of ``extract_image_features`` for the audio leg: same
    byte-budget partitioning upstream (``size_bucketed``), same
    Arrow-batched ``mapInPandas`` shape, a flat feature schema ready
    for DataFrame-side filtering (e.g. drop sub-second clips before
    an expensive embedding stage). ``decoder`` is the swap seam —
    ships with the real stdlib ``wav_decode``; a soundfile/ffmpeg
    decoder is the same one-function change.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:  # NULL container → no feature row
                    continue
                payload = bytes(payload)
                out.append({id_col: mid, "n_bytes": len(payload),
                            **decoder(payload)})
            yield pd.DataFrame(out, columns=[
                id_col, "n_bytes", "sample_rate", "n_channels",
                "n_samples", "duration_s", "rms", "zcr"])

    # the id column keeps the caller's name (AUDIO_FEATURES_SCHEMA
    # documents the default media_id contract)
    return media.mapInPandas(
        run, schema=f"{id_col} long, n_bytes int, sample_rate int, "
                    "n_channels int, n_samples long, duration_s double, "
                    "rms double, zcr double")


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
                if payload is None:  # NULL container → no frames
                    continue
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
