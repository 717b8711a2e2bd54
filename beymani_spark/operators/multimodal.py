"""Multimodal (image/audio/video) column handling for training-data
pipelines (north-star surface).

Media are opaque ``binary`` payload columns with typed metadata; all
processing runs as Arrow-batched ``mapInPandas`` so payload bytes stream
through in bounded batches (never collected, never exploded into rows).
The codec layer is pluggable: ``decode='real'`` uses Pillow when it is
importable (image decode + grayscale + resize; proven by the
skip-if-missing test tests/test_real_codec.py) and raises
NotImplementedError otherwise — this container ships no codec libraries,
so the in-sandbox contract is ``decode='fake'``, a deterministic
pseudo-decode derived from the payload bytes (stable across runs/
partitions) that keeps the Spark-side plumbing — schema, batch shape,
partitioning, downstream joins — fully real, testable, and
oracle-verifiable. ``decode='ppm'`` decodes ACTUAL image bytes (binary
netpbm P5/P6) in pure numpy — header parse, BT.601 luma, nearest resize
— so the real-decode path executes end-to-end even here, with no
library (tests/test_real_codec.py); ``decode='wav'`` (RIFF/WAVE PCM16
audio) and ``decode='avi'`` (uncompressed RIFF-AVI video frames) do the
same for the other two modalities on the shared RIFF chunk machinery.
``decode='png'`` decodes MAINSTREAM image bytes — real PNG — with only
stdlib zlib + numpy (chunk walk, inflate, all five scanline unfilters,
palette/alpha color types; ``png_encode`` is the matching fixture
encoder); Pillow stays the fast swap-in. Arbitrary-container video
decode additionally needs an ffmpeg binding (PyAV); it stays guarded
the same way.

At 100 TB: payloads dominate storage; these operators preserve columnar
pruning (metadata-only queries never touch payload bytes because parquet
reads only requested columns) and all feature outputs are small fixed-width
arrays suitable for the similarity operators.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<format: string, width: int, height: int, duration_ms: int>"
)


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic pseudo-decode: SHA-256 counter-mode expansion of the
    payload. Platform/library-independent (no PRNG involved), so external
    oracles (e.g. the DuckDB sha256() in the media_features correctness
    query) can reproduce the 'decoded' bytes exactly."""
    n = width * height
    blocks = (n + 31) // 32
    digest = b"".join(
        hashlib.sha256(payload + str(j).encode()).digest() for j in range(blocks)
    )
    return np.frombuffer(digest[:n], dtype=np.uint8).reshape(height, width)


def _real_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real codec path: Pillow decode -> grayscale -> resize. Guarded at
    call time so environments without codec libraries fail with a clear
    NotImplementedError instead of an import crash."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - exercised only sans PIL
        raise NotImplementedError(
            "decode='real' requires Pillow (PIL), not present in this "
            "environment; use decode='fake'"
        ) from e
    import io

    img = Image.open(io.BytesIO(payload)).convert("L")
    if img.size != (width, height):
        img = img.resize((width, height), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def _ppm_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """REAL bytes-to-pixels decode with no external library: binary netpbm
    images — PGM ``P5`` (grayscale) and PPM ``P6`` (RGB), maxval <= 255 —
    parsed and rasterized in pure numpy. This is the in-sandbox execution
    proof for the real-codec plumbing: the container has no Pillow/PyAV,
    so ``decode='real'`` stays a guarded swap-in, but ``decode='ppm'``
    runs an actual image format end-to-end through the same batch path.

    RGB collapses to luma with integer BT.601 ((299R+587G+114B+500)//1000
    — exact integer arithmetic, deterministic everywhere); resize to the
    requested grid is nearest-neighbor over linspace indices (the same
    deterministic subsample rule as the fake-path resize)."""
    # header: magic, then whitespace-separated width/height/maxval with
    # '#' comments running to end-of-line; ONE whitespace byte then raster
    if not payload.startswith((b"P5", b"P6")):
        raise ValueError("ppm decode supports binary netpbm P5/P6 payloads")
    rgb = payload.startswith(b"P6")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        if i >= len(payload):
            raise ValueError("truncated netpbm header")
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
    w0, h0, maxval = fields
    if maxval > 255:
        raise ValueError("netpbm maxval > 255 (2-byte samples) not supported")
    i += 1  # the single whitespace byte after maxval
    n = w0 * h0 * (3 if rgb else 1)
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=i)
    if maxval != 255:
        # netpbm samples are fractions of maxval: rescale to the 0..255
        # intensity scale (round-half-up integer arithmetic) so e.g. a
        # maxval=15 image keeps its true brightness instead of decoding
        # near-black
        raster = (
            (raster.astype(np.int64) * 255 + maxval // 2) // maxval
        ).astype(np.uint8)
    if rgb:
        px = raster.reshape(h0, w0, 3).astype(np.int64)
        gray = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2] + 500) // 1000
        gray = gray.astype(np.uint8)
    else:
        gray = raster.reshape(h0, w0)
    if (w0, h0) != (width, height):
        ys = np.linspace(0, h0 - 1, height).astype(int)
        xs = np.linspace(0, w0 - 1, width).astype(int)
        gray = gray[ys][:, xs]
    return gray


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: bytes-per-pixel by PNG color type (bit depth 8)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """REAL PNG decode with no external library: stdlib ``zlib`` inflate +
    numpy per-row unfilter — the mainstream-image-format member of the
    in-sandbox codec family (netpbm `_ppm_pixels`, WAV `_wav_samples`,
    AVI `_avi_frames`). Pillow remains the fast swap-in via
    ``decode='real'``; this path removes the "no mainstream image codec
    ever executed" gap genuinely in-sandbox.

    Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), non-interlaced — the overwhelming majority
    of real-world PNGs. 16-bit and Adam7 interlace raise with a clear
    message (use ``decode='real'``). All five scanline filters (None /
    Sub / Up / Average / Paeth) are implemented; Sub is a vectorized
    per-channel cumulative sum mod 256, Up is whole-row vectorized, and
    only Average/Paeth (true byte-serial dependency chains) fall back to
    a per-byte loop. Color collapses to integer BT.601 luma (alpha
    ignored — features describe the raster, not compositing) and the
    resize to the requested grid is the family's shared deterministic
    nearest-neighbor rule."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("png decode supports PNG payloads (bad signature)")
    pos, ihdr, plte, idat = len(_PNG_SIG), None, None, []
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        cid = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"IHDR":
            ihdr = body
        elif cid == b"PLTE":
            plte = body
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        pos += 12 + size  # length + type + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("truncated png: missing IHDR or IDAT")
    w0 = int.from_bytes(ihdr[0:4], "big")
    h0 = int.from_bytes(ihdr[4:8], "big")
    depth, color, comp, filt, interlace = ihdr[8:13]
    if depth != 8:
        raise ValueError("png decode supports bit depth 8 (use decode='real')")
    if interlace:
        raise ValueError("png decode supports non-interlaced only (use decode='real')")
    channels = _PNG_CHANNELS.get(color)
    if channels is None or comp != 0 or filt != 0:
        raise ValueError(f"png: unsupported color/compression ({color}/{comp}/{filt})")
    if w0 <= 0 or h0 <= 0:
        raise ValueError("png: bad dimensions")
    raw = zlib.decompress(b"".join(idat))
    stride = w0 * channels
    if len(raw) < (stride + 1) * h0:
        raise ValueError("png: short raster")

    out = np.empty((h0, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    bpp = channels
    for y in range(h0):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub: per-channel cumulative sum mod 256
            cur = np.cumsum(line.reshape(w0, bpp), axis=0, dtype=np.int64)
            cur = (cur & 0xFF).reshape(stride)
        elif ft in (3, 4):  # Average / Paeth: byte-serial
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ft == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"png: unknown scanline filter {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur

    px = out.reshape(h0, w0, channels).astype(np.int64)
    if color == 3:
        if plte is None:
            raise ValueError("png: palette image without PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3).astype(np.int64)
        rgb = pal[px[..., 0]]
        gray = (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2] + 500) // 1000
    elif color in (2, 6):
        gray = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2] + 500) // 1000
    else:  # 0 grayscale, 4 gray+alpha: first channel is the luma
        gray = px[..., 0]
    gray = gray.astype(np.uint8)
    if (w0, h0) != (width, height):
        ys = np.linspace(0, h0 - 1, height).astype(int)
        xs = np.linspace(0, w0 - 1, width).astype(int)
        gray = gray[ys][:, xs]
    return gray


def png_encode(
    pixels: np.ndarray, color: int = 0, filters: Sequence[int] | int = 0
) -> bytes:
    """Minimal stdlib PNG ENCODER (fixture/ingest utility, and the
    synthesizer behind the media_features_png correctness query): emits a
    spec-valid bit-depth-8 PNG — signature, IHDR, optional PLTE, one IDAT,
    IEND, CRC-32 per chunk — for color types 0 (gray, pixels (h, w)),
    2 (RGB, pixels (h, w, 3)) and 6 (RGBA, pixels (h, w, 4)). ``filters``
    applies the given scanline filter type per row (int = same type every
    row), computing the spec's residuals so the decoder's unfilter paths
    are exercised on real filtered data. The zlib stream uses level-0
    stored blocks, which keeps the payload a pure deterministic function
    of the pixels — the property the DuckDB oracle relies on."""
    import zlib

    px = np.asarray(pixels, dtype=np.int64)
    if color == 0:
        px = px.reshape(px.shape[0], px.shape[1], 1)
    h0, w0, channels = px.shape
    if _PNG_CHANNELS.get(color) != channels:
        raise ValueError(f"pixels shape {px.shape} does not match color type {color}")
    flat = px.reshape(h0, w0 * channels)
    ftypes = [filters] * h0 if isinstance(filters, int) else list(filters)
    if len(ftypes) != h0:
        raise ValueError("one filter type per row required")
    bpp = channels
    raw = bytearray()
    prev = np.zeros(w0 * channels, dtype=np.int64)
    for y in range(h0):
        cur, ft = flat[y], ftypes[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        if ft == 0:
            res = cur
        elif ft == 1:
            res = cur - left
        elif ft == 2:
            res = cur - prev
        elif ft == 3:
            res = cur - (left + prev) // 2
        elif ft == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            res = cur - pred
        else:
            raise ValueError(f"png: unknown scanline filter {ft}")
        raw.append(ft)
        raw.extend((res & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big")
            + cid
            + body
            + zlib.crc32(cid + body).to_bytes(4, "big")
        )

    ihdr = (
        w0.to_bytes(4, "big")
        + h0.to_bytes(4, "big")
        + bytes([8, color, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 0))
        + chunk(b"IEND", b"")
    )


def _decode_batch(payloads: list[bytes], width: int, height: int, decode: str) -> np.ndarray:
    """(batch, height, width) uint8 pixels via the selected codec."""
    if decode == "real":
        return np.stack([_real_pixels(p, width, height) for p in payloads])
    if decode == "ppm":
        return np.stack([_ppm_pixels(p, width, height) for p in payloads])
    if decode == "png":
        return np.stack([_png_pixels(p, width, height) for p in payloads])
    return np.stack([_fake_pixels(p, width, height) for p in payloads])


def _spread(df: DataFrame) -> DataFrame:
    """Few-split sources (one parquet file) would decode every batch in a
    single python worker; round-robin them across the cluster first. Real
    multi-split media tables skip this branch and stay shuffle-free."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism // 2:
        df = df.repartition(parallelism)
    return df


def decode_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_features: int = 16,
    decode: str = "fake",
) -> DataFrame:
    """(media_id, n_bytes, features array<double>) — decode + global feature
    extraction per media item."""
    if decode not in ("fake", "real", "ppm", "png"):
        raise ValueError(f"unknown decode mode: {decode}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf[payload_col]]
            if not payloads:
                yield pd.DataFrame(columns=[id_col, "n_bytes", "features"])
                continue
            # per-item decode loop (codec call); everything else is
            # whole-batch array work
            px = _decode_batch(payloads, 32, 32, decode)
            b, size = px.shape[0], px.shape[1] * px.shape[2]
            # batched histogram: offset each row's bucket ids into a private
            # range and run ONE bincount over the flattened batch
            buckets = (px.reshape(b, size).astype(np.int64) * n_features) // 256
            buckets += np.arange(b)[:, None] * n_features
            hist = np.bincount(buckets.ravel(), minlength=b * n_features)
            feat = hist.reshape(b, n_features) / size
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_bytes": [len(p) for p in payloads],
                    "features": list(feat),
                }
            )

    return _spread(df).mapInPandas(
        gen, schema=f"{id_col} long, n_bytes long, features array<double>"
    )


def resize(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    width: int = 8,
    height: int = 8,
    decode: str = "fake",
) -> DataFrame:
    """(media_id, width, height, pixels array<int>) — downsampled grid."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf[payload_col]]
            if not payloads:
                yield pd.DataFrame(columns=[id_col, "width", "height", "pixels"])
                continue
            if decode in ("real", "ppm", "png"):
                # these codecs resize during decode — already (height, width)
                small = _decode_batch(payloads, width, height, decode)
                small = small.reshape(len(payloads), -1).astype(np.int64)
            else:
                px = _decode_batch(payloads, 32, 32, decode)
                ys = np.linspace(0, px.shape[1] - 1, height).astype(int)
                xs = np.linspace(0, px.shape[2] - 1, width).astype(int)
                # one fancy-index subsample across the whole batch
                small = px[:, ys][:, :, xs].reshape(len(payloads), -1).astype(np.int64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "width": np.full(len(payloads), width, dtype=np.int32),
                    "height": np.full(len(payloads), height, dtype=np.int32),
                    "pixels": list(small),
                }
            )

    return _spread(df).mapInPandas(
        gen, schema=f"{id_col} long, width int, height int, pixels array<int>"
    )


def sample_frames(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    meta_col: str = "meta",
    fps: float = 1.0,
    decode: str = "fake",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset,
    (media_id, frame_idx, offset_ms, frame_features).

    ``decode='fake'``: frame count derives from meta.duration_ms and the
    per-frame features are the deterministic pseudo-decode.
    ``decode='avi'``: REAL bytes->frames execution in pure numpy —
    uncompressed RIFF-AVI payloads are walked frame by frame
    (``_avi_frames``), duration and native frame times come from the
    container's own dwMicroSecPerFrame, and each sampled offset reads the
    native frame covering it (features = 8x8 nearest-subsampled luma /
    255, the same grid as the fake path). ``decode='real'`` (arbitrary
    containers via an ffmpeg binding) stays a guarded swap-in."""
    if decode not in ("fake", "real", "avi"):
        raise ValueError(f"unknown decode mode: {decode}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [id_col, "frame_idx", "offset_ms", "frame_features"]
        for pdf in batches:
            if decode == "real":
                try:
                    import av  # noqa: F401 - presence check for the ffmpeg binding
                except ImportError as e:
                    raise NotImplementedError(
                        "decode='real' frame sampling requires an ffmpeg "
                        "binding (PyAV), not present in this environment; "
                        "use decode='fake', or decode='avi' for "
                        "uncompressed RIFF-AVI payloads"
                    ) from e
                raise NotImplementedError(
                    "real video frame decode is not implemented yet even "
                    "with PyAV present — wire av.open(BytesIO(payload)) "
                    "frame iteration here"
                )
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            if decode == "avi":
                # ragged containers: per-clip loop over true frame counts
                out_id, out_k, out_off, out_feat = [], [], [], []
                for mid, p in zip(pdf[id_col], pdf[payload_col]):
                    frames, usec = _avi_frames(bytes(p))
                    nf = len(frames)
                    duration_ms = nf * usec // 1000
                    n_out = max(1, int(duration_ms / 1000.0 * fps))
                    ys = np.linspace(0, frames.shape[1] - 1, 8).astype(int)
                    xs = np.linspace(0, frames.shape[2] - 1, 8).astype(int)
                    for k in range(n_out):
                        off = int(k * 1000.0 / fps)
                        idx = min(nf - 1, off * 1000 // usec)
                        out_id.append(mid)
                        out_k.append(k)
                        out_off.append(off)
                        out_feat.append(frames[idx][ys][:, xs].ravel() / 255.0)
                yield pd.DataFrame(
                    {
                        id_col: out_id,
                        "frame_idx": np.array(out_k, dtype=np.int32),
                        "offset_ms": np.array(out_off, dtype=np.int64),
                        "frame_features": out_feat,
                    }
                )
                continue
            metas = pdf[meta_col]
            durations = np.array(
                [int(m["duration_ms"]) if m is not None else 0 for m in metas]
            )
            n_frames = np.maximum(1, (durations / 1000.0 * fps).astype(int))
            # explode to one row per (item, frame) with repeat/concatenate;
            # the per-frame decode loop stands in for the codec call
            ids = np.repeat(pdf[id_col].to_numpy(), n_frames)
            frame_idx = np.concatenate([np.arange(n) for n in n_frames])
            offsets = (frame_idx * 1000.0 / fps).astype(np.int64)
            raw = np.empty(len(pdf), dtype=object)
            raw[:] = [bytes(p) for p in pdf[payload_col]]
            payloads = np.repeat(raw, n_frames)
            # ASCII offset suffix (":<ms>") keeps the frame 'decode' exactly
            # reproducible by external oracles (same property as _fake_pixels)
            feats = [
                (_fake_pixels(p + b":" + str(int(off)).encode(), 8, 8).ravel() / 255.0)
                for p, off in zip(payloads, offsets)
            ]
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": frame_idx.astype(np.int32),
                    "offset_ms": offsets,
                    "frame_features": feats,
                }
            )

    return _spread(df).mapInPandas(
        gen,
        schema=f"{id_col} long, frame_idx int, offset_ms long, frame_features array<double>",
    )


def media_metadata_stats(df: DataFrame, kind_col: str = "kind", payload_col: str = "payload") -> DataFrame:
    """Payload-size profile per media kind — metadata-style scan. Uses
    length(payload) which still reads payload bytes; for true metadata-only
    scans keep sizes as a separate column at ingest."""
    return df.groupBy(kind_col).agg(
        F.count("*").alias("cnt"),
        F.avg(F.length(payload_col)).alias("avg_bytes"),
        F.max(F.length(payload_col)).alias("max_bytes"),
    )


def _wav_samples(payload: bytes) -> np.ndarray:
    """REAL audio decode with no external library: RIFF/WAVE PCM
    16-bit-signed payloads parsed in pure numpy — the audio analogue of
    `_ppm_pixels`. Walks the chunk list (fmt / data may be preceded by
    LIST/fact chunks), requires format tag 1 (integer PCM) at 16 bits,
    and averages channels to mono with exact integer arithmetic
    (sum // n_channels, matching the truncation a fixed-point downmix
    does). Returns int16-range values as an int32 array."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav decode supports RIFF/WAVE payloads")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("truncated wav: missing fmt or data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError("wav decode supports 16-bit integer PCM (format 1)")
    if n_channels < 1:
        raise ValueError("wav: zero channels")
    x = np.frombuffer(
        data, dtype="<i2", count=(len(data) // (2 * n_channels)) * n_channels
    ).astype(np.int32)
    if n_channels > 1:
        x = x.reshape(-1, n_channels).sum(axis=1) // n_channels
    if len(x) == 0:
        raise ValueError("wav: empty data chunk")
    return x


def _avi_frames(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL video decode with no external library: uncompressed RIFF-AVI
    payloads (BI_RGB DIB frames, 24-bit BGR or 8-bit grayscale) parsed in
    pure numpy — the video analogue of ``_wav_samples`` / ``_ppm_pixels``,
    built on the same RIFF chunk discipline (word-aligned [fourcc, size,
    body] records; LIST chunks recurse). Returns (frames, usec_per_frame)
    where frames is an (n_frames, height, width) uint8 luma array in
    top-down row order.

    Container facts used: ``avih`` carries dwMicroSecPerFrame;
    ``strh``/``strf`` of the first ``vids`` stream carry the
    BITMAPINFOHEADER (width, signed height, bit depth, compression);
    ``##db``/``##dc`` chunks under ``movi`` are the frames. DIB rasters
    are bottom-up when biHeight > 0 (flipped here), rows padded to 4-byte
    stride, 24-bit samples in BGR order (BT.601 integer luma, same
    arithmetic as the netpbm path)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("avi decode supports RIFF/AVI payloads")
    state = {"usec": None, "w": None, "h": None, "bits": None, "comp": None,
             "strh_type": None}
    frames_raw: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + size)  # first 4 bytes = list type
            elif cid == b"avih":
                state["usec"] = int.from_bytes(payload[body : body + 4], "little")
            elif cid == b"strh":
                state["strh_type"] = payload[body : body + 4]
            elif cid == b"strf" and state["strh_type"] == b"vids" and state["w"] is None:
                b = payload[body : body + size]
                if len(b) < 20:
                    raise ValueError("truncated avi: short BITMAPINFOHEADER")
                state["w"] = int.from_bytes(b[4:8], "little", signed=True)
                state["h"] = int.from_bytes(b[8:12], "little", signed=True)
                state["bits"] = int.from_bytes(b[14:16], "little")
                state["comp"] = int.from_bytes(b[16:20], "little")
            elif cid[2:4] in (b"db", b"dc"):
                frames_raw.append(payload[body : body + size])
            pos = body + size + (size & 1)  # chunks are word-aligned

    walk(12, len(payload))
    w, h_signed, bits = state["w"], state["h"], state["bits"]
    if w is None or not frames_raw or not state["usec"]:
        raise ValueError("truncated avi: missing header, frames, or frame rate")
    if state["comp"] != 0 or bits not in (8, 24):
        raise ValueError("avi decode supports uncompressed BI_RGB 8/24-bit frames")
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError("avi: bad frame dimensions")
    stride = ((w * (bits // 8) + 3) // 4) * 4
    out = np.empty((len(frames_raw), h, w), dtype=np.uint8)
    for i, fb in enumerate(frames_raw):
        if len(fb) < stride * h:
            raise ValueError("avi: short frame chunk")
        arr = np.frombuffer(fb, dtype=np.uint8, count=stride * h).reshape(h, stride)
        if bits == 24:
            px = arr[:, : w * 3].reshape(h, w, 3).astype(np.int64)
            gray = (299 * px[..., 2] + 587 * px[..., 1] + 114 * px[..., 0] + 500) // 1000
        else:
            gray = arr[:, :w].astype(np.int64)
        if h_signed > 0:  # bottom-up raster -> top-down frames
            gray = gray[::-1]
        out[i] = gray.astype(np.uint8)
    return out, int(state["usec"])


def audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_samples: int = 1024,
    decode: str = "fake",
) -> DataFrame:
    """(media_id, n_bytes, rms, peak, zero_cross) — audio-clip feature
    extraction over Arrow batches, completing the multimodal family's
    decode surface (image: decode_features/resize; video: sample_frames;
    audio: this).

    decode='fake' expands the payload through the same SHA-256 counter
    stream as the image path and reads it as unsigned 8-bit PCM centered
    at 128 — bit-reproducible by the DuckDB oracle. Features are computed
    so the oracle can match EXACTLY, not approximately: the squared sum
    accumulates in int64, the mean divides by a power of two (exact in
    binary), and IEEE-754 sqrt is correctly rounded in both engines, so
    even rms is bit-identical cross-engine. decode='wav' parses REAL
    audio bytes — RIFF/WAVE PCM16 — in pure numpy (chunk walk, int16
    raster, channel averaging), the audio analogue of the image path's
    decode='ppm'; it runs end-to-end here with no codec library (features
    over each clip's true sample count). decode='real' would need a
    general audio codec (soundfile/PyAV), absent here, and raises like
    the other real-codec gates."""
    if decode == "real":
        raise NotImplementedError(
            "decode='real' for audio requires an audio codec library "
            "(soundfile / PyAV), not present in this environment; use "
            "decode='fake' or decode='wav'"
        )
    if decode not in ("fake", "wav"):
        raise ValueError(f"unknown decode mode: {decode}")
    n = int(n_samples)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf[payload_col]]
            if not payloads:
                yield pd.DataFrame(
                    columns=[id_col, "n_bytes", "rms", "peak", "zero_cross"]
                )
                continue
            if decode == "wav":
                # ragged clips: per-clip loop over true sample counts
                clips = [_wav_samples(p) for p in payloads]
                rms = np.array(
                    [
                        np.sqrt(float((x.astype(np.int64) ** 2).sum()) / len(x))
                        for x in clips
                    ]
                )
                peak = np.array([int(np.abs(x.astype(np.int64)).max()) for x in clips])
                zc = np.array(
                    [int(((x[:-1] < 0) != (x[1:] < 0)).sum()) for x in clips]
                )
            else:
                px = _decode_batch(payloads, n, 1, "fake").reshape(len(payloads), n)
                x = px.astype(np.int64) - 128
                sq = (x * x).sum(axis=1)          # exact int64
                rms = np.sqrt(sq / float(n))      # power-of-two division, exact
                peak = np.abs(x).max(axis=1)
                neg = x < 0
                zc = (neg[:, :-1] != neg[:, 1:]).sum(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_bytes": [len(p) for p in payloads],
                    "rms": rms,
                    "peak": np.asarray(peak).astype(np.int32),
                    "zero_cross": np.asarray(zc).astype(np.int32),
                }
            )

    return _spread(df).mapInPandas(
        gen,
        schema=f"{id_col} long, n_bytes long, rms double, peak int, zero_cross int",
    )
