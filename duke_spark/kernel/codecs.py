"""Pure-stdlib media codecs: PNG (zlib) and WAV (RIFF/PCM).

The container has no PIL/libjpeg/ffmpeg, but PNG's pipeline is just
zlib + five per-scanline difference filters, and WAV is a RIFF header
over raw PCM — both decodable with ``zlib``/``numpy`` alone. These
kernels de-stub ``operators.multimodal``: ``image_features`` /
``resize_images`` / ``audio_frame_stats`` run on REAL bytes with zero
new dependencies. JPEG/MP3-class codecs remain out of scope (declared,
not silently wrong: unknown magic still raises).

Coverage: 8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced
PNG (color types 0/4/2/6 — the overwhelming majority of stored PNGs),
all five filter types on decode; PCM16 and float32 WAV, any channel
count (downmixed to mono float32).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CTYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w, channels).

    Supports 8-bit depth, color types 0/2/4/6, no interlace; palette
    (type 3), 16-bit, and Adam7 raise ``ValueError`` (unsupported, not
    misdecoded)."""
    if blob is None or len(blob) < 8 or blob[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos:pos + 4])
        ctype = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        pos += 12 + length                      # skip CRC
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in _CTYPE_CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={color_type}, "
            f"interlace={interlace}); only 8-bit non-interlaced 0/2/4/6")
    c = _CTYPE_CHANNELS[color_type]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ftype = int(raw[r, 0])
        line = raw[r, 1:].astype(np.int32)
        if ftype == 0:                                   # None
            recon = line
        elif ftype == 1:                                 # Sub (lag-c prefix sum)
            recon = (line.reshape(w, c).cumsum(axis=0) % 256).reshape(stride)
        elif ftype == 2:                                 # Up
            recon = (line + prev) % 256
        elif ftype in (3, 4):                            # Average / Paeth
            recon = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = recon[i - c] if i >= c else 0
                b = prev[i]
                if ftype == 3:
                    recon[i] = (line[i] + ((a + b) >> 1)) % 256
                else:
                    cc = prev[i - c] if i >= c else 0
                    recon[i] = (line[i] + _paeth(a, b, cc)) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[r] = recon.astype(np.uint8)
        prev = recon
    return out.reshape(h, w, c)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data +
            struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, c∈{1,2,3,4}) → PNG bytes (filter 0 rows)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = arr.astype(np.uint8).reshape(h, w * c)
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), body], axis=1).tobytes()
    return (PNG_SIG + _chunk(b"IHDR", ihdr) +
            _chunk(b"IDAT", zlib.compress(scanlines)) +
            _chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, mono float32 samples in [-1, 1]).

    PCM16 (format 1) and IEEE float32 (format 3); multi-channel input is
    mean-downmixed."""
    if (blob is None or len(blob) < 12 or blob[:4] != b"RIFF"
            or blob[8:12] != b"WAVE"):
        raise ValueError("not a WAV (bad RIFF header)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        payload = blob[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)            # chunks are 2-byte aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif cid == b"data":
            data = payload
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, sr, _brate, _align, bits = fmt
    if (audio_fmt, bits) == (1, 16):
        samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif (audio_fmt, bits) == (3, 32):
        samples = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV (format={audio_fmt}, bits={bits})")
    if n_ch > 1:
        samples = samples[:len(samples) - len(samples) % n_ch] \
            .reshape(-1, n_ch).mean(axis=1)
    return sr, samples.astype(np.float32)


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """mono float32 [-1, 1] → PCM16 WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64) * 32767.0,
                  -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
