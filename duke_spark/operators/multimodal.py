"""Multimodal (image/audio/video) column operators.

Media travel as opaque ``binary`` columns with typed metadata — the same
pattern the transcript engine uses for text: Spark owns partitioning,
pruning, and shuffle; per-blob compute happens in Arrow-batched pandas
functions via ``mapInPandas`` (never per-row Python). The reference is
text-only (``Duke/dataset.py:45`` keeps object-dtype columns and drops the
rest), so these operators are part of the training-data-pipeline surface
grafted on top, anchored to the same batch-kernel architecture as
``duke_spark.operators.linking``.

Real codecs, stdlib-only: PNG and WAV decode/encode via
``kernel.codecs`` (zlib + RIFF — no PIL/ffmpeg needed), so
``image_features``/``resize_images``/``audio_frame_stats`` run on real
bytes. JPEG and MP3 get header-only *metadata* (SOF marker walk for
dimensions; MPEG frame-header walk for sample rate / channels /
duration) — full entropy decode of either still needs external libs
absent from this container and raises ``NotImplementedError``
(declared, not silently wrong). The deterministic fixture codec (header-parse + seeded synthesis
from the blob hash) remains behind ``fake=True`` for reproducible tests.

At 100 TB: blobs dominate row size, so ``spark.sql.files.maxPartitionBytes``
governs batch memory, metadata-only queries must never touch the blob
column (column pruning — keep metadata in separate parquet columns, never
inside a struct with the blob), and feature extraction emits fixed-size
``array<float>`` so downstream joins/aggs stay JVM-side.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# deterministic fake media + header codecs (test substrate)
# ---------------------------------------------------------------------------

_MAGIC_IMG = b"DSIM"  # duke_spark image: magic, w, h, c  (u16/u16/u8)
_MAGIC_AUD = b"DSAU"  # duke_spark audio: magic, sample_rate u32, n_samples u32


def make_fake_image(key: str, width: int, height: int,
                    channels: int = 3) -> bytes:
    """Deterministic pseudo-image blob: parseable header + hash-seeded
    payload. Stands in for JPEG/PNG bytes in fixtures."""
    header = _MAGIC_IMG + struct.pack("<HHB", width, height, channels)
    seed = hashlib.blake2b(key.encode(), digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(seed, "big"))
    payload = rng.integers(0, 256, size=width * height * channels,
                           dtype=np.uint8).tobytes()
    return header + payload


def make_fake_jpeg(width: int, height: int, channels: int = 3) -> bytes:
    """Header-valid JPEG (SOI + JFIF APP0 + SOF0 + EOI): carries real
    dimensions in the SOF0 marker but no entropy-coded data, so it
    exercises the marker walker in :func:`media_metadata` without
    libjpeg. Always 41 bytes for 3 components (38 + channels)."""
    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * channels, 8,
                                    height, width, channels)
    sof += b"".join(bytes([i + 1, 0x11, 0]) for i in range(channels))
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


# SOF0-SOF15 minus DHT (C4), JPG (C8), DAC (CC) — every frame-header
# marker whose payload starts precision/height/width/ncomponents
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _jpeg_sof_dims(blob: bytes) -> Optional[tuple]:
    """(width, height, components) from the first SOF marker, walking the
    marker stream only (APP/EXIF/COM segments skipped by their declared
    length; stops at SOS) — no entropy decode, so cost is O(#segments)
    regardless of file size."""
    n = len(blob)
    if n < 4 or blob[0] != 0xFF or blob[1] != 0xD8:
        return None
    i = 2
    while i + 1 < n:
        if blob[i] != 0xFF:
            return None                      # marker-stream desync
        marker = blob[i + 1]
        if marker == 0xFF:                   # fill byte
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            i += 2                           # standalone: TEM/RSTn/SOI/EOI
            continue
        if i + 4 > n:
            return None
        seg_len = (blob[i + 2] << 8) | blob[i + 3]
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            if seg_len < 8 or i + 9 >= n:
                return None
            h = (blob[i + 5] << 8) | blob[i + 6]
            w = (blob[i + 7] << 8) | blob[i + 8]
            c = blob[i + 9]
            return (w, h, c) if w > 0 and h > 0 and c > 0 else None
        if marker == 0xDA:                   # SOS: SOF must precede it
            return None
        i += 2 + seg_len
    return None


# --- MPEG audio (MP3) frame headers ---------------------------------------
# Bitrate tables (kbps) indexed [1..14]; index 0 = free, 15 = bad.
# Keys: (version_group, layer) where version_group is 1 for MPEG1 and
# 2 for MPEG2/2.5 (which share tables).
_MP3_BITRATES = {
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
             144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
             144, 160),
}
# Sample-rate tables indexed by the 2-bit sr index; keyed by version bits.
_MP3_RATES = {3: (44100, 48000, 32000),     # MPEG1
              2: (22050, 24000, 16000),     # MPEG2
              0: (11025, 12000, 8000)}      # MPEG2.5


def make_fake_mp3(sample_rate: int = 44100, n_frames: int = 4,
                  channels: int = 2, bitrate_kbps: int = 128) -> bytes:
    """Header-valid CBR MPEG-1 Layer III stream: empty ID3v2.3 tag +
    ``n_frames`` frames whose 4-byte headers carry real rate/mode bits
    but whose payloads are zeros (no entropy data) — exercises the frame
    walker in :func:`media_metadata` without ffmpeg, the same trick
    :func:`make_fake_jpeg` plays on the SOF walker."""
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    br_idx = 1 + _MP3_BITRATES[(1, 3)].index(bitrate_kbps)
    mode = 3 if channels == 1 else 0            # mono / stereo
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), mode << 6])
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    id3 = b"ID3\x03\x00\x00\x00\x00\x00\x00"    # v2.3, no flags, size 0
    return id3 + (hdr + b"\x00" * (frame_len - 4)) * n_frames


def _mp3_frame_header(blob: bytes, i: int):
    """Parse the 4-byte MPEG audio frame header at offset ``i`` →
    (sample_rate, channels, samples_per_frame, frame_len) or None."""
    if i + 4 > len(blob) or blob[i] != 0xFF or (blob[i + 1] & 0xE0) != 0xE0:
        return None
    ver = (blob[i + 1] >> 3) & 3                # 3=MPEG1 2=MPEG2 0=MPEG2.5
    layer_bits = (blob[i + 1] >> 1) & 3         # 3=I 2=II 1=III
    if ver == 1 or layer_bits == 0:
        return None                             # reserved
    layer = 4 - layer_bits                      # 1/2/3
    br_idx = (blob[i + 2] >> 4) & 0xF
    sr_idx = (blob[i + 2] >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:        # free-format unsupported
        return None
    vgroup = 1 if ver == 3 else 2
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx - 1] * 1000
    sr = _MP3_RATES[ver][sr_idx]
    pad = (blob[i + 2] >> 1) & 1
    channels = 1 if ((blob[i + 3] >> 6) & 3) == 3 else 2
    if layer == 1:
        spf, frame_len = 384, (12 * bitrate // sr + pad) * 4
    elif layer == 2:
        spf, frame_len = 1152, 144 * bitrate // sr + pad
    else:                                       # Layer III
        spf = 1152 if ver == 3 else 576
        frame_len = (144 if ver == 3 else 72) * bitrate // sr + pad
    return (sr, channels, spf, frame_len) if frame_len > 4 else None


def _mp3_stream_info(blob: bytes) -> Optional[tuple]:
    """(sample_rate, channels, n_samples) from an MPEG audio stream:
    skip any leading ID3v2 tag by its declared syncsafe size, then walk
    CBR/VBR frame headers (4 bytes each, hop by declared frame length —
    O(#frames), header-only, no entropy decode). Sample rate / channels
    come from the first frame; ``n_samples`` = Σ samples-per-frame over
    valid frames. Stops at the first invalid header (trailing tags)."""
    n = len(blob)
    i = 0
    if n >= 10 and blob[:3] == b"ID3":
        size = ((blob[6] & 0x7F) << 21) | ((blob[7] & 0x7F) << 14) | \
               ((blob[8] & 0x7F) << 7) | (blob[9] & 0x7F)
        i = 10 + size + (10 if blob[5] & 0x10 else 0)
    first = _mp3_frame_header(blob, i)
    if first is None:
        return None
    sr, channels, _, _ = first
    n_samples = 0
    while True:
        h = _mp3_frame_header(blob, i)
        if h is None:
            break
        n_samples += h[2]
        i += h[3]
    return (sr, channels, n_samples)


def make_fake_audio(key: str, sample_rate: int, n_samples: int) -> bytes:
    header = _MAGIC_AUD + struct.pack("<II", sample_rate, n_samples)
    seed = hashlib.blake2b(key.encode(), digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(seed, "big"))
    payload = (rng.standard_normal(n_samples).astype(np.float32)).tobytes()
    return header + payload


def _parse_image(blob: bytes) -> Optional[np.ndarray]:
    if blob is None or len(blob) < 9 or blob[:4] != _MAGIC_IMG:
        return None
    w, h, c = struct.unpack("<HHB", blob[4:9])
    arr = np.frombuffer(blob, dtype=np.uint8, offset=9)
    if arr.size != w * h * c:
        return None
    return arr.reshape(h, w, c)


def _parse_audio(blob: bytes) -> Optional[np.ndarray]:
    if blob is None or len(blob) < 12 or blob[:4] != _MAGIC_AUD:
        return None
    sr, n = struct.unpack("<II", blob[4:12])
    arr = np.frombuffer(blob, dtype=np.float32, offset=12)
    return arr if arr.size == n else None


def decode_image(blob: bytes, fake: bool = False) -> np.ndarray:
    """Image bytes → uint8 (h, w, c). PNG decodes for real via the
    stdlib zlib codec (``kernel.codecs.decode_png``); ``fake=True``
    additionally accepts the deterministic DSIM fixture format. Formats
    needing external libs (JPEG/WebP — PIL/libjpeg absent in this
    container) raise ``NotImplementedError``."""
    from duke_spark.kernel.codecs import PNG_SIG, decode_png
    if blob is not None and bytes(blob[:8]) == PNG_SIG:
        return decode_png(bytes(blob))
    arr = _parse_image(blob)
    if arr is not None:
        if not fake:
            raise ValueError(
                "DSIM fixture blob; pass fake=True to accept the fixture "
                "codec")
        return arr
    raise NotImplementedError(
        "only PNG is decodable stdlib-side; JPEG/WebP need PIL/libjpeg "
        "(absent in this container)")


def decode_audio(blob: bytes, fake: bool = False) -> np.ndarray:
    """Audio bytes → mono float32 samples. WAV (PCM16/float32) decodes
    for real via ``kernel.codecs.decode_wav``; ``fake=True`` additionally
    accepts the DSAU fixture format."""
    from duke_spark.kernel.codecs import decode_wav
    if blob is not None and bytes(blob[:4]) == b"RIFF":
        return decode_wav(bytes(blob))[1]
    arr = _parse_audio(blob)
    if arr is not None:
        if not fake:
            raise ValueError(
                "DSAU fixture blob; pass fake=True to accept the fixture "
                "codec")
        return arr
    raise NotImplementedError(
        "only WAV is decodable stdlib-side; MP3/AAC need ffmpeg (absent "
        "in this container)")


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_hash", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("valid", T.BooleanType()),
])


def media_metadata(df: DataFrame, id_col: str = "media_id",
                   blob_col: str = "blob") -> DataFrame:
    """Header-parse every blob → typed metadata row (no full decode).

    One ``mapInPandas`` pass; reads only (id, blob) thanks to the explicit
    ``select`` (column pruning reaches the scan). Hash is blake2b-128 of
    the payload — the exact-dedup key for media.

    Recognized headers, all parsed columnar-NumPy over a stacked 44-byte
    head block (no per-row struct.unpack, no payload materialization):
    PNG (IHDR dims/channels — IHDR is mandatory-first per spec), WAV
    (canonical RIFF layout: fmt at offset 12, data at 36 — the layout
    every encoder writes; non-canonical WAVs get sample_rate only), and
    the two deterministic fixture formats (DSIM/DSAU). JPEG dims come
    from the first SOF marker (SOF0/SOF2/...), which sits at arbitrary
    offset after APP/EXIF segments — those rows take a per-row marker
    walk (``_jpeg_sof_dims``), header-only, JPEG rows only. MPEG audio
    (MP3) likewise: ID3v2 skip + frame-header walk (``_mp3_stream_info``)
    yields sample_rate and total samples, per-row on MP3 candidates
    only. Full JPEG/MP3 *decode* still raises (libjpeg/ffmpeg absent —
    ``decode_image``/``decode_audio``)."""
    from duke_spark.kernel.codecs import PNG_SIG
    pruned = df.select(F.col(id_col).alias("media_id"), F.col(blob_col))
    HEAD = 44

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [b if b is not None else b"" for b in pdf[blob_col]]
            n = len(blobs)
            if n == 0:
                continue
            heads = np.frombuffer(
                b"".join(bytes(b[:HEAD]).ljust(HEAD, b"\0") for b in blobs),
                dtype=np.uint8).reshape(n, HEAD).astype(np.int64)
            n_bytes = np.fromiter((len(b) for b in blobs),
                                  dtype=np.int64, count=n)
            hashes = [hashlib.blake2b(bytes(b), digest_size=16).hexdigest()
                      for b in blobs]

            def eq(off: int, sig: bytes):
                ref = np.frombuffer(sig, dtype=np.uint8)
                return (heads[:, off:off + len(sig)] == ref).all(axis=1)

            def u16le(off):
                return heads[:, off] | (heads[:, off + 1] << 8)

            def u32le(off):
                return (heads[:, off] | (heads[:, off + 1] << 8) |
                        (heads[:, off + 2] << 16) | (heads[:, off + 3] << 24))

            def u32be(off):
                return ((heads[:, off] << 24) | (heads[:, off + 1] << 16) |
                        (heads[:, off + 2] << 8) | heads[:, off + 3])

            # fixture image: DSIM, w/h u16 LE, c u8, raw payload
            is_dsim = eq(0, _MAGIC_IMG)
            fw, fh, fc = u16le(4), u16le(6), heads[:, 8]
            dsim_ok = is_dsim & (n_bytes >= 9) & (n_bytes - 9 == fw * fh * fc)
            # fixture audio: DSAU, sr/nsamples u32 LE, f32 payload
            is_dsau = eq(0, _MAGIC_AUD)
            fsr, fns = u32le(4), u32le(8)
            dsau_ok = is_dsau & (n_bytes >= 12) & (n_bytes - 12 == 4 * fns)
            # PNG: sig + mandatory-first IHDR at offset 16
            is_png = eq(0, PNG_SIG) & eq(12, b"IHDR")
            pw, ph = u32be(16), u32be(20)
            pdepth, pctype = heads[:, 24], heads[:, 25]
            pc = np.select([pctype == 0, pctype == 2, pctype == 4,
                            pctype == 6], [1, 3, 2, 4], default=0)
            png_ok = is_png & (pdepth == 8) & (pc > 0)
            # JPEG: dims live in a SOF marker at arbitrary offset (after
            # APP0/EXIF), so JPEG rows pay a per-row marker walk — still
            # header-only (stops at SOS), and only on JPEG rows
            is_jpg = eq(0, b"\xff\xd8\xff")
            jpg_ok = np.zeros(n, dtype=bool)
            jw = np.zeros(n, dtype=np.int64)
            jh = np.zeros(n, dtype=np.int64)
            jc = np.zeros(n, dtype=np.int64)
            for idx in np.nonzero(is_jpg)[0]:
                dims = _jpeg_sof_dims(bytes(blobs[idx]))
                if dims is not None:
                    jw[idx], jh[idx], jc[idx] = dims
                    jpg_ok[idx] = True
            # WAV: RIFF/WAVE; canonical fmt chunk at 12, data at 36
            is_wav = eq(0, b"RIFF") & eq(8, b"WAVE")
            wav_canon = is_wav & eq(12, b"fmt ")
            wsr = u32le(24)
            wch = np.maximum(u16le(22), 1)
            wbits = np.maximum(u16le(34), 8)
            has_data = wav_canon & eq(36, b"data")
            wns = np.where(has_data,
                           u32le(40) // np.maximum((wbits // 8) * wch, 1), 0)
            wav_ok = wav_canon & (wsr > 0)
            # MPEG audio (MP3): sync/rate/mode bits live in 4-byte frame
            # headers after an optional ID3v2 tag of declared size, so
            # candidate rows (ID3 magic or frame sync at 0) pay a per-row
            # frame walk (``_mp3_stream_info``) — header-only, MP3 rows
            # only, same containment as the JPEG SOF walk above
            is_mp3c = (eq(0, b"ID3") |
                       ((heads[:, 0] == 0xFF) & ((heads[:, 1] & 0xE0)
                                                 == 0xE0))) & ~wav_ok
            mp3_ok = np.zeros(n, dtype=bool)
            msr = np.zeros(n, dtype=np.int64)
            mns = np.zeros(n, dtype=np.int64)
            for idx in np.nonzero(is_mp3c)[0]:
                info = _mp3_stream_info(bytes(blobs[idx]))
                if info is not None:
                    msr[idx], _, mns[idx] = info
                    mp3_ok[idx] = True

            img_ok = dsim_ok | png_ok | jpg_ok
            aud_ok = dsau_ok | wav_ok | mp3_ok
            kind = np.where(img_ok, "image",
                            np.where(aud_ok, "audio", "unknown"))
            w = np.select([png_ok, jpg_ok], [pw, jw], default=fw)
            h = np.select([png_ok, jpg_ok], [ph, jh], default=fh)
            c = np.select([png_ok, jpg_ok], [pc, jc], default=fc)
            sr = np.select([wav_ok, mp3_ok], [wsr, msr], default=fsr)
            ns = np.select([wav_ok, mp3_ok], [wns, mns], default=fns)
            ns_mask = aud_ok & (dsau_ok | has_data | mp3_ok)

            def opt(vals, mask, cast=int):
                return [cast(v) if m else None
                        for v, m in zip(vals, mask)]

            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": kind,
                "n_bytes": n_bytes,
                "content_hash": hashes,
                "width": opt(w, img_ok),
                "height": opt(h, img_ok),
                "channels": opt(c, img_ok),
                "sample_rate": opt(sr, aud_ok),
                "n_samples": opt(ns, ns_mask),
                "valid": img_ok | aud_ok,
            })

    return pruned.mapInPandas(run, schema=MEDIA_META_SCHEMA)


IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def image_features(df: DataFrame, id_col: str = "media_id",
                   blob_col: str = "blob", bins: int = 16,
                   fake: bool = True) -> DataFrame:
    """Per-image fixed-size feature vector (channel-mean + intensity
    histogram) via the (stubbed) decoder. Output is ``array<float>`` so it
    feeds straight into ``duke_spark.operators.similarity``."""
    pruned = df.select(F.col(id_col).alias("media_id"), F.col(blob_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: List[str] = []
            feats: List[Optional[List[float]]] = []
            for mid, blob in zip(pdf["media_id"], pdf[blob_col]):
                ids.append(mid)
                try:
                    arr = decode_image(bytes(blob), fake=fake)
                except (ValueError, TypeError, NotImplementedError):
                    feats.append(None)
                    continue
                flat = arr.astype(np.float32)
                hist, _ = np.histogram(flat, bins=bins, range=(0, 256))
                hist = hist.astype(np.float32) / max(flat.size, 1)
                chan_mean = flat.reshape(-1, arr.shape[2]).mean(axis=0) / 255.0
                feats.append(np.concatenate([chan_mean, hist])
                             .astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return pruned.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("blob", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  id_col: str = "media_id", blob_col: str = "blob",
                  fake: bool = True) -> DataFrame:
    """Nearest-neighbor resize, re-encoded in the INPUT's format: PNG in
    → PNG out (stdlib zlib encoder), fixture in → fixture out."""
    from duke_spark.kernel.codecs import PNG_SIG, encode_png
    pruned = df.select(F.col(id_col).alias("media_id"), F.col(blob_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf[blob_col]):
                try:
                    arr = decode_image(bytes(blob), fake=fake)
                except (ValueError, TypeError, NotImplementedError):
                    continue
                h, w, c = arr.shape
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                small = arr[yi][:, xi]
                if bytes(blob[:8]) == PNG_SIG:
                    out_blob = encode_png(small)
                else:
                    out_blob = (_MAGIC_IMG +
                                struct.pack("<HHB", out_w, out_h, c)
                                + small.tobytes())
                rows.append({"media_id": mid, "blob": out_blob,
                             "width": out_w, "height": out_h})
            yield pd.DataFrame(rows, columns=["media_id", "blob",
                                              "width", "height"])

    return pruned.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("offset_samples", T.IntegerType()),
    T.StructField("rms", T.FloatType()),
])


def audio_frame_stats(df: DataFrame, frame_len: int = 1024,
                      max_frames: int = 16, id_col: str = "media_id",
                      blob_col: str = "blob",
                      fake: bool = True) -> DataFrame:
    """Evenly-spaced frame sampling (the audio/video analogue of video
    frame-sample) + per-frame RMS. One blob row explodes to ≤max_frames
    small rows — the fan-out happens inside the batch, so no JVM-side
    explode over binary data."""
    pruned = df.select(F.col(id_col).alias("media_id"), F.col(blob_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf[blob_col]):
                try:
                    samples = decode_audio(bytes(blob), fake=fake)
                except (ValueError, TypeError, NotImplementedError):
                    continue
                n_frames = min(max_frames,
                               max(len(samples) // frame_len, 1))
                for i in range(n_frames):
                    off = (i * max(len(samples) - frame_len, 0)
                           // max(n_frames - 1, 1)) if n_frames > 1 else 0
                    frame = samples[off:off + frame_len]
                    rms = float(np.sqrt(np.mean(frame ** 2))) if len(frame) \
                        else 0.0
                    rows.append({"media_id": mid, "frame_idx": i,
                                 "offset_samples": off, "rms": rms})
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "offset_samples", "rms"])

    return pruned.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
