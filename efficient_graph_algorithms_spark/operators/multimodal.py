"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing here is REAL and tested — schemas, Arrow batch
shapes, ``mapInPandas`` partitioning, metadata propagation.

Decode status per modality:

* **audio/WAV — REAL.** ``decode_wav`` is a pure-NumPy RIFF parser
  (PCM 8/16/32-bit + IEEE float32, mono or interleaved multichannel);
  ``_audio_features`` computes real signal features (duration, RMS,
  zero-crossing rate, peak, 12 log-spaced spectral band energies).
  ``encode_wav_pcm16`` closes the round-trip for tests. Any ``audio``
  row whose payload carries a RIFF/WAVE header takes this path
  unconditionally.
* **image/BMP — REAL.** ``decode_bmp`` is a pure-NumPy parser for
  uncompressed 24-bit BI_RGB (4-byte row padding, bottom-up and
  top-down layouts); ``_image_features`` computes real pixel features
  (channel means, luminance std, 12-bin luminance histogram).
  ``encode_bmp24`` closes the round-trip for tests. Any ``image`` row
  whose payload carries a BM header takes this path unconditionally.
* **video/Y4M — REAL.** ``decode_y4m`` is a pure-NumPy parser for
  YUV4MPEG2 streams (uncompressed planar YUV with an ASCII header;
  mono / 4:2:0 / 4:2:2 / 4:4:4 colourspaces, per-frame parameter
  tags); ``_video_features`` computes real temporal features
  (frame count, fps, mean luma, motion energy, 12-bin luminance
  histogram). ``encode_y4m`` closes the round-trip for tests. Any
  ``video`` row whose payload carries a YUV4MPEG2 magic takes this
  path unconditionally.
* **image/PNG — REAL.** stdlib ``zlib`` inflate + NumPy row
  unfiltering (all five filters), chunk CRCs verified.
* **image/JPEG — REAL.** ``decode_jpeg`` is a pure-NumPy baseline
  sequential DCT decoder (marker parse, canonical Huffman, dequant,
  zigzag, float IDCT, chroma upsample, YCbCr→RGB); grayscale and
  YCbCr with sampling factors up to 2 (4:4:4 / 4:2:2 / 4:2:0).
  ``encode_jpeg`` closes the round-trip for tests (in-stream DHT/DQT,
  so any baseline decoder reads its output). Progressive/arithmetic/
  restart-interval streams raise NotImplementedError.
* **video/MP4 container — METADATA REAL.** ``decode_mp4_meta`` is a
  pure-Python ISO-BMFF box walker (ftyp brand, mvhd duration/timescale
  v0+v1, tkhd dimensions, stsd codec fourccs, 64-bit largesize).
* **audio/MP3 framing — METADATA REAL.** ``decode_mp3_meta`` is a
  pure-Python MPEG audio frame-header walker (ID3v2 skip, MPEG-1/2/2.5
  Layer I-III bitrate/sample-rate tables, frame chaining → frame
  count, duration, mean bitrate, VBR flag).
* **compressed SAMPLE decode (MP4 mdat bitstreams, MP3 spectra) —
  STUBBED** (ffmpeg/librosa are not in this container):
  ``decode_media`` raises ``NotImplementedError`` unless
  ``deterministic_fake=True``, in which case it produces seeded fake
  features so the distributed pipeline is exercised end-to-end.

Pattern: media rows are large (MBs) — the operators keep batches small
via ``spark.sql.execution.arrow.maxRecordsPerBatch`` and never collect
binaries to the driver; feature extraction emits fixed-width
``array<float>`` columns that downstream similarity search consumes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)
FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, np.ndarray]:
    """Deterministic fake decode: dims + features are a pure function of
    the payload bytes (so tests are stable under any partitioning)."""
    digest = hashlib.md5(payload).digest()
    w = 16 + digest[0] % 64
    h = 16 + digest[1] % 64
    rng = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    feats = np.resize(rng, FEATURE_DIM) / 255.0
    return w, h, feats


# --- real WAV decode (pure NumPy, no external libs) ------------------------

def _is_wav(payload: bytes) -> bool:
    return len(payload) >= 44 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE byte stream → (sample_rate, n_channels,
    samples float32[n_frames, n_channels] scaled to [-1, 1]).

    Supports PCM (format 1) at 8/16/32 bits and IEEE float32 (format 3),
    walking the chunk list properly (fmt/data may be preceded by LIST or
    fact chunks; chunk sizes are padded to even offsets per RIFF)."""
    if not _is_wav(payload):
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(payload), 8 + int.from_bytes(payload[4:8], "little"))
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        csz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if n_ch < 1 or rate < 1:
        raise ValueError(f"bad WAV header: channels={n_ch} rate={rate}")
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 8:  # 8-bit PCM is unsigned
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise NotImplementedError(f"WAV format {audio_fmt}/{bits}-bit not supported")
    n_frames = len(x) // n_ch
    return rate, n_ch, x[: n_frames * n_ch].reshape(n_frames, n_ch)


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """float[-1,1] (n_frames,) or (n_frames, n_ch) → 16-bit PCM WAV bytes.
    Round-trip partner of ``decode_wav`` (used by tests and demos)."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2").tobytes()
    hdr = (
        b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * n_ch * 2).to_bytes(4, "little")
        + (n_ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(pcm).to_bytes(4, "little")
    )
    return hdr + pcm


def _audio_features(rate: int, samples: np.ndarray) -> tuple[int, int, np.ndarray]:
    """Real audio features, FEATURE_DIM wide:
    [duration_s, rms, zero_crossing_rate, peak, 12 log-band energies].
    Returns (width=n_channels, height=sample_rate//100, features)."""
    n_ch = samples.shape[1]
    mono = samples.mean(axis=1)
    n = len(mono)
    dur = n / rate
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    peak = float(np.max(np.abs(mono))) if n else 0.0
    bands = np.zeros(FEATURE_DIM - 4, dtype=np.float32)
    if n > 8:
        spec = np.abs(np.fft.rfft(mono)) ** 2
        # 12 log-spaced bins over (0, Nyquist]
        edges = np.unique(
            np.round(np.logspace(0, np.log10(len(spec)), len(bands) + 1)).astype(int)
        )
        for i in range(min(len(bands), len(edges) - 1)):
            seg = spec[edges[i] : edges[i + 1]]
            bands[i] = np.log1p(seg.sum())
    feats = np.concatenate(
        [np.array([dur, rms, zcr, peak], dtype=np.float32), bands]
    ).astype(np.float32)
    return n_ch, rate // 100, feats


# --- real BMP decode (pure NumPy, no external libs) ------------------------

def _is_bmp(payload: bytes) -> bool:
    return len(payload) >= 54 and payload[:2] == b"BM"


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an uncompressed 24-bit BI_RGB BMP → (width, height,
    pixels float32[h, w, 3] RGB in [0, 1]).

    Handles the two layout quirks that trip naive parsers: rows are
    padded to 4-byte boundaries, and a positive biHeight means the rows
    are stored bottom-up (negative = top-down)."""
    if not _is_bmp(payload):
        raise ValueError("not a BMP stream")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP {bpp}bpp compression={comp} not supported")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dims {w}x{h}")
    stride = (3 * w + 3) // 4 * 4
    body = payload[off : off + stride * h]
    if len(body) < stride * h:
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)[:, : 3 * w]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return w, h, img.astype(np.float32) / 255.0


def encode_bmp24(img: np.ndarray) -> bytes:
    """uint8 or float[0,1] RGB (h, w, 3) → 24-bit bottom-up BMP bytes.
    Round-trip partner of ``decode_bmp`` (tests and demos)."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    h, w, _ = a.shape
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = a[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, RGB->BGR
    body = rows.tobytes()
    hdr = (
        b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\0\0\0\0"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") + (2835).to_bytes(4, "little")
        + (0).to_bytes(4, "little") + (0).to_bytes(4, "little")
    )
    return hdr + body


def _is_png(payload: bytes) -> bool:
    return payload[:8] == b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a PNG → (width, height, pixels float32[h, w, 3] RGB in
    [0, 1]) with stdlib ``zlib`` only — no PIL.

    Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA —
    alpha dropped), no interlacing. All five row filters (None/Sub/Up/
    Average/Paeth) are undone; Sub's in-row prefix dependence is
    vectorized as a per-byte-lane cumulative sum mod 256, Average and
    Paeth fall back to an in-row scan. Chunk CRCs are verified
    (zlib.crc32) so corrupt payloads fail loudly as ValueError."""
    import zlib

    if not _is_png(payload):
        raise ValueError("not a PNG stream")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("PNG chunk truncated")
        crc = int.from_bytes(payload[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, _comp, _filt, interlace = ihdr[8:13]
    if depth != 8 or ctype not in (0, 2, 6) or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={ctype} interlace={interlace} "
            "not supported (8-bit gray/RGB/RGBA, no interlace)"
        )
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG scanline data truncated")
    arr = np.frombuffer(raw[: h * (stride + 1)], dtype=np.uint8).reshape(
        h, stride + 1
    )
    filters, rows = arr[:, 0], arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, r = int(filters[y]), rows[y]
        if f == 0:
            cur = r.copy()
        elif f == 1:  # Sub: prefix sum per byte lane mod 256
            cur = np.cumsum(r.reshape(w, ch), axis=0, dtype=np.int64).reshape(stride) % 256
        elif f == 2:  # Up
            cur = (r + prev) % 256
        elif f in (3, 4):  # Average / Paeth: in-row scan
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 3:
                    cur[x] = (r[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - ch] if x >= ch else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    cur[x] = (r[x] + pred) % 256
        else:
            raise ValueError(f"PNG bad filter byte {f}")
        out[y], prev = cur, cur
    px = out.reshape(h, w, ch)
    if ctype == 0:
        img = np.repeat(px, 3, axis=2)
    elif ctype == 2:
        img = px
    else:
        img = px[:, :, :3]
    return w, h, img.astype(np.float32) / 255.0


def encode_png(img: np.ndarray) -> bytes:
    """uint8 or float[0,1] RGB (h, w, 3) → 8-bit RGB PNG (filter 0
    rows). Round-trip partner of ``decode_png``."""
    import zlib

    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    h, w, _ = a.shape
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + typ + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT) — pure NumPy, no libjpeg/PIL
# ---------------------------------------------------------------------------

def _is_jpeg(payload: bytes) -> bool:
    return payload[:3] == b"\xff\xd8\xff"


ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _dct_mat() -> np.ndarray:
    n = np.arange(8)
    k = n.reshape(8, 1)
    m = np.cos((2 * n + 1) * k * np.pi / 16.0) * 0.5
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m  # orthonormal: block_dct = M @ b @ M.T; inverse = M.T @ B @ M


_DCT_M = _dct_mat()


class _BitReader:
    """MSB-first bit reader over a JPEG entropy-coded segment (0xFF00
    byte-stuffing already removed by the caller)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data exhausted")
            self.bitbuf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_huff(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical JPEG assignment (Annex C)."""
    table = {}
    code = 0
    it = iter(symbols)
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = next(it)
            code += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG invalid Huffman code")


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes):
    """Parse a baseline sequential JPEG (SOF0) → (width, height, pixels
    float32[h, w, 3] RGB in [0, 1]) with NumPy only — no PIL/libjpeg.

    Supported: 8-bit precision, 1 component (grayscale) or 3 (JFIF
    YCbCr) with arbitrary sampling factors up to 2 (4:4:4, 4:2:2,
    4:2:0; chroma upsampled by pixel repetition), one scan, standard
    Huffman entropy coding. Progressive (SOF2), arithmetic coding,
    and restart intervals raise NotImplementedError.

    Malformed streams raise ValueError at this boundary (same contract
    as decode_png/decode_y4m) — incidental KeyError/IndexError/
    StopIteration/ZeroDivisionError from a corrupt bitstream never
    escape, so callers can keep a tight except list and a decoder BUG
    on a valid payload still surfaces as itself."""
    try:
        return _decode_jpeg_raw(payload)
    except (KeyError, IndexError, StopIteration, ZeroDivisionError) as e:
        # KeyError: SOS referencing a DHT/DQT never defined; IndexError:
        # truncated segment body; StopIteration: DHT counts exceed symbol
        # bytes; ZeroDivisionError: SOF sampling factor of 0.
        raise ValueError(f"JPEG malformed stream ({type(e).__name__}: {e})") from e


def _decode_jpeg_raw(payload: bytes):
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        ln = int.from_bytes(payload[pos + 2: pos + 4], "big")
        seg = payload[pos + 4: pos + 2 + ln]
        if len(seg) != ln - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(seg[p + 1: p + 65], dtype=np.uint8).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1: p + 17])
                nsym = sum(counts)
                syms = seg[p + 17: p + 17 + nsym]
                huff[(tc, th)] = _build_huff(counts, syms)
                p += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError("JPEG precision != 8")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF{marker - 0xC0} not baseline")
        elif marker == 0xDD:  # DRI
            if int.from_bytes(seg[0:2], "big") != 0:
                raise NotImplementedError("JPEG restart intervals")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scomps.append({"id": cs, "dc": tt >> 4, "ac": tt & 0x0F})
            scan = (scomps, payload[pos + 2 + ln:])
            break
        pos += 2 + ln
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    w, h, comps = frame
    scomps, raw = scan
    # strip byte stuffing, stop at EOI / restart markers
    out = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0xFF:
            nxt = raw[i + 1] if i + 1 < len(raw) else 0xD9
            if nxt == 0x00:
                out.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                raise NotImplementedError("JPEG restart markers")
            break  # EOI or next marker
        out.append(b)
        i += 1
    br = _BitReader(bytes(out))
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
    order = {sc["id"]: sc for sc in scomps}
    pred = {c["id"]: 0 for c in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for c in comps:
                sc = order[c["id"]]
                dctab = huff[(0, sc["dc"])]
                actab = huff[(1, sc["ac"])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(br, dctab)
                        diff = _extend(br.read_bits(s), s)
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, actab)
                            r, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coef[k] = _extend(br.read_bits(sz), sz)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coef * q[np.arange(64)]  # dequant in zigzag order
                        blk = block.reshape(8, 8)
                        pix = _DCT_M.T @ blk @ _DCT_M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0: y0 + 8, x0: x0 + 8] = pix
    # upsample to full res and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, hmax // c["h"], axis=1), vmax // c["v"], axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        ycc = np.stack([full[0]] * 3, axis=2)
        rgb = ycc
    else:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
    return w, h, (np.clip(rgb, 0.0, 255.0) / 255.0).astype(np.float32)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

# simple VALID canonical Huffman tables (carried in-stream via DHT, so
# any decoder reads them): 12 DC symbols at length 4; the 162 legal AC
# symbols (EOB, ZRL, run 0-15 x size 1-10) at length 8 (Kraft: 12/16
# and 162/256, both <= 1; every DHT count byte < 256)
_ENC_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_SYMS = bytes(range(12))
_AC_SYMBOLS = sorted(
    {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)
_ENC_AC_COUNTS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8
_ENC_AC_SYMS = bytes(_AC_SYMBOLS)


def _enc_codes(counts, syms):
    table = {}
    code = 0
    it = iter(syms)
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[next(it)] = (length, code)
            code += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= (8 - self.n)
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(img: np.ndarray, quant: int = 1, subsample: bool = False) -> bytes:
    """uint8 or float[0,1] RGB (h, w, 3) or gray (h, w) → baseline JPEG.

    ``quant`` is a single uniform quantization step (1 = near-lossless,
    larger = lossier); ``subsample=True`` emits 4:2:0 (chroma = 2x2
    mean), else 4:4:4. Round-trip partner of ``decode_jpeg`` for tests;
    tables are written in-stream so any baseline decoder reads it."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rf = a[:, :, 0].astype(np.float64)
        gf = a[:, :, 1].astype(np.float64)
        bf = a[:, :, 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        if subsample:
            hp = h + (h % 2)
            wp = w + (w % 2)
            cbp = np.pad(cb, ((0, hp - h), (0, wp - w)), mode="edge")
            crp = np.pad(cr, ((0, hp - h), (0, wp - w)), mode="edge")
            cb = cbp.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
            planes = [y, cb, cr]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad each plane to its MCU-aligned size
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        padded.append(np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"))
    qtab = np.full(64, quant, dtype=np.int32)
    dc_codes = _enc_codes(_ENC_DC_COUNTS, _ENC_DC_SYMS)
    ac_codes = _enc_codes(_ENC_AC_COUNTS, _ENC_AC_SYMS)
    bw = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = p[y0: y0 + 8, x0: x0 + 8] - 128.0
                        co = _DCT_M @ blk @ _DCT_M.T
                        ql = np.round(co.reshape(64) / qtab).astype(np.int64)
                        zz = ql[ZIGZAG]  # natural order -> zigzag stream order
                        # DC
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        s = _csize(diff)
                        ln, code = dc_codes[s]
                        bw.write(code, ln)
                        if s:
                            v = diff if diff >= 0 else diff + (1 << s) - 1
                            bw.write(v, s)
                        # AC
                        run = 0
                        last = 63
                        while last > 0 and zz[last] == 0:
                            last -= 1
                        for k in range(1, last + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = ac_codes[0xF0]
                                bw.write(code, ln)
                                run -= 16
                            s = _csize(v)
                            ln, code = ac_codes[(run << 4) | s]
                            bw.write(code, ln)
                            vv = v if v >= 0 else v + (1 << s) - 1
                            bw.write(vv, s)
                            run = 0
                        if last < 63:
                            ln, code = ac_codes[0x00]  # EOB
                            bw.write(code, ln)
    data = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_qtab = np.zeros(64, dtype=np.uint8)
    zz_qtab[:] = qtab[ZIGZAG].astype(np.uint8)
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + zz_qtab.tobytes())
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_COUNTS) + _ENC_DC_SYMS)
    out += seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_COUNTS) + _ENC_AC_SYMS)
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += data + b"\xff\xd9"
    return out


def _image_features(w: int, h: int, img: np.ndarray) -> tuple[int, int, np.ndarray]:
    """Real image features, FEATURE_DIM wide:
    [mean_r, mean_g, mean_b, std_luminance, 12-bin luminance histogram
    (mass-normalized)]. Returns (width, height, features)."""
    lum = 0.2126 * img[:, :, 0] + 0.7152 * img[:, :, 1] + 0.0722 * img[:, :, 2]
    hist, _ = np.histogram(lum, bins=FEATURE_DIM - 4, range=(0.0, 1.0))
    feats = np.concatenate(
        [
            img.reshape(-1, 3).mean(axis=0),
            np.array([lum.std()]),
            hist / max(1, lum.size),
        ]
    ).astype(np.float32)
    return w, h, feats


# --- real Y4M video decode (pure NumPy, no external libs) -------------------

#: chroma-plane size as a fraction of the luma plane, per Y4M colourspace
#: family (YUV4MPEG2 spec: C tag; 420 variants share one plane layout)
# colourspace -> (horizontal, vertical) chroma subsampling divisors;
# plane size is ceil(w/hdiv) * ceil(h/vdiv), NOT a fraction of w*h —
# at odd frame dimensions subsampled planes round each axis UP
_Y4M_CHROMA_DIV = {
    "mono": None,
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
}


def _y4m_chroma_plane_sz(w: int, h: int, cs: str) -> int:
    div = _Y4M_CHROMA_DIV[cs]
    if div is None:
        return 0
    return -(-w // div[0]) * -(-h // div[1])


def _is_y4m(payload: bytes) -> bool:
    return len(payload) >= 10 and payload[:10] == b"YUV4MPEG2 "


def decode_y4m(payload: bytes) -> tuple[float, np.ndarray]:
    """Parse a YUV4MPEG2 byte stream → (fps, luma float32[n_frames, h, w]
    in [0, 1]).

    Walks the ASCII stream header (``YUV4MPEG2 W.. H.. F<num>:<den> ...
    C<colourspace>\\n``), then each ``FRAME[ params]\\n`` marker followed
    by raw planar YUV. Chroma planes are validated for length and
    skipped — the feature extractor below is luma-only. Per-frame
    parameter tags (allowed by the spec) are tolerated."""
    if not _is_y4m(payload):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M stream header unterminated")
    w = h = 0
    fps_num, fps_den = 25, 1
    cs = "420jpeg"  # spec default when no C tag is present
    for tag in payload[10:nl].split(b" "):
        if not tag:
            continue
        key, val = chr(tag[0]), tag[1:].decode("ascii", "replace")
        if key == "W":
            w = int(val)
        elif key == "H":
            h = int(val)
        elif key == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif key == "C":
            cs = val
        # I (interlacing), A (pixel aspect), X (comment) don't affect layout
    if w <= 0 or h <= 0 or fps_num <= 0 or fps_den <= 0:
        raise ValueError(f"bad Y4M header: W={w} H={h} F={fps_num}:{fps_den}")
    if cs not in _Y4M_CHROMA_DIV:
        raise NotImplementedError(f"Y4M colourspace C{cs} not supported")
    luma_sz = w * h
    frame_sz = luma_sz + 2 * _y4m_chroma_plane_sz(w, h, cs)
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        fnl = payload.find(b"\n", pos + 5)
        if fnl < 0:
            raise ValueError("Y4M frame header unterminated")
        body = payload[fnl + 1 : fnl + 1 + frame_sz]
        if len(body) < frame_sz:
            raise ValueError("Y4M frame data truncated")
        frames.append(
            np.frombuffer(body[:luma_sz], dtype=np.uint8).reshape(h, w)
        )
        pos = fnl + 1 + frame_sz
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return fps_num / fps_den, np.stack(frames).astype(np.float32) / 255.0


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), colourspace: str = "mono"
) -> bytes:
    """uint8 or float[0,1] luma (n_frames, h, w) → YUV4MPEG2 bytes.
    Round-trip partner of ``decode_y4m`` (tests and demos). For
    subsampled colourspaces the chroma planes are neutral (128); luma
    round-trips exactly."""
    a = np.asarray(frames)
    if a.dtype != np.uint8:
        a = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    n, h, w = a.shape
    chroma = b"\x80" * (2 * _y4m_chroma_plane_sz(w, h, colourspace))
    hdr = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colourspace}\n"
    ).encode("ascii")
    return hdr + b"".join(b"FRAME\n" + f.tobytes() + chroma for f in a)


def _video_features(fps: float, frames: np.ndarray) -> tuple[int, int, np.ndarray]:
    """Real video features, FEATURE_DIM wide:
    [n_frames, fps, mean_luma, motion (mean |frame delta|),
    12-bin luminance histogram (mass-normalized)].
    Returns (width, height, features)."""
    n, h, w = frames.shape
    motion = float(np.mean(np.abs(np.diff(frames, axis=0)))) if n > 1 else 0.0
    hist, _ = np.histogram(frames, bins=FEATURE_DIM - 4, range=(0.0, 1.0))
    feats = np.concatenate(
        [
            np.array([float(n), fps, frames.mean(), motion], dtype=np.float32),
            (hist / max(1, frames.size)).astype(np.float32),
        ]
    ).astype(np.float32)
    return w, h, feats


def _is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def decode_mp4_meta(payload: bytes) -> dict:
    """REAL ISO-BMFF (MP4) container metadata via a pure-Python box
    walker — no codec libraries: duration/timescale from ``mvhd``,
    per-track dimensions from ``tkhd``, codec (sample-entry format
    fourcc) from ``stsd``, brand from ``ftyp``. Only the SAMPLE DATA
    (the compressed bitstream inside ``mdat``) stays undecodable here.

    Returns {brand, timescale, duration, duration_sec, n_tracks,
    codecs: [fourcc...], width, height} (width/height from the first
    track carrying a nonzero 16.16 fixed-point size).
    Malformed structures raise ValueError at this boundary, the same
    contract as the other decoders."""

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(buf[pos : pos + 4], "big")
            btype = buf[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:
                if pos + 16 > end:
                    raise ValueError("MP4 truncated largesize box header")
                size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
                body = pos + 16
            elif size == 0:
                size = end - pos
            if size < body - pos or pos + size > end:
                raise ValueError(
                    f"MP4 box {btype!r} size {size} escapes its container"
                )
            yield btype, body, pos + size
            pos += size

    if not _is_mp4(payload):
        raise ValueError("not an ISO-BMFF stream (no ftyp)")
    meta: dict = {
        "brand": payload[8:12].decode("latin-1"),
        "timescale": 0,
        "duration": 0,
        "duration_sec": 0.0,
        "n_tracks": 0,
        "codecs": [],
        "width": 0,
        "height": 0,
    }
    containers = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
    stack = [(0, len(payload))]
    while stack:
        lo, hi = stack.pop(0)  # FIFO: codecs land in document order
        for btype, body, bend in walk(payload, lo, hi):
            if btype in containers:
                if btype == b"trak":
                    meta["n_tracks"] += 1
                stack.append((body, bend))
            elif btype == b"mvhd":
                if bend - body < 4:
                    raise ValueError("MP4 mvhd truncated")
                ver = payload[body]
                if ver == 1:
                    if bend - body < 4 + 8 + 8 + 4 + 8:
                        raise ValueError("MP4 mvhd v1 truncated")
                    meta["timescale"] = int.from_bytes(payload[body + 20 : body + 24], "big")
                    meta["duration"] = int.from_bytes(payload[body + 24 : body + 32], "big")
                else:
                    if bend - body < 4 + 4 + 4 + 4 + 4:
                        raise ValueError("MP4 mvhd v0 truncated")
                    meta["timescale"] = int.from_bytes(payload[body + 12 : body + 16], "big")
                    meta["duration"] = int.from_bytes(payload[body + 16 : body + 20], "big")
                if meta["timescale"]:
                    meta["duration_sec"] = meta["duration"] / meta["timescale"]
            elif btype == b"tkhd":
                # width/height are the LAST 8 bytes, 16.16 fixed point
                if bend - body < 8:
                    raise ValueError("MP4 tkhd truncated")
                w16 = int.from_bytes(payload[bend - 8 : bend - 4], "big") / 65536.0
                h16 = int.from_bytes(payload[bend - 4 : bend], "big") / 65536.0
                if w16 and h16 and not meta["width"]:
                    meta["width"], meta["height"] = int(w16), int(h16)
            elif btype == b"stsd":
                if bend - body < 8:
                    raise ValueError("MP4 stsd truncated")
                n_entries = int.from_bytes(payload[body + 4 : body + 8], "big")
                pos = body + 8
                for _ in range(n_entries):
                    if pos + 8 > bend:
                        raise ValueError("MP4 stsd entry truncated")
                    esize = int.from_bytes(payload[pos : pos + 4], "big")
                    if esize < 8 or pos + esize > bend:
                        raise ValueError("MP4 stsd entry size invalid")
                    meta["codecs"].append(payload[pos + 4 : pos + 8].decode("latin-1"))
                    pos += esize
    return meta


def _mp4_features(meta: dict) -> tuple[int, int, np.ndarray]:
    """Container-metadata features for MP4 (sample decode stubbed —
    luma/motion slots are 0): [duration_sec, n_tracks, timescale/1000,
    n_codecs, zeros...]. The shape matches FEATURES_SCHEMA so MP4 rows
    flow through the same pipeline as fully-decoded media."""
    feats = np.zeros(FEATURE_DIM, dtype=np.float32)
    feats[0] = meta["duration_sec"]
    feats[1] = meta["n_tracks"]
    feats[2] = meta["timescale"] / 1000.0
    feats[3] = len(meta["codecs"])
    return meta["width"], meta["height"], feats


_MP3_SAMPLERATE = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}
_MP3_BITRATE = {
    # kbps by (version_group, layer); index 1-14, 0=free, 15=bad.
    # version_group: 3 = MPEG-1, 2/0 = MPEG-2 / MPEG-2.5 (shared table).
    (3, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (3, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (3, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}


def _mp3_frame(payload: bytes, pos: int) -> tuple[int, int, int, int, int] | None:
    """Parse one MPEG audio frame header at ``pos``. Returns
    (frame_len, samples_per_frame, sample_rate, bitrate_kbps,
    n_channels) or None if the 4 bytes are not a valid header."""
    if pos + 4 > len(payload):
        return None
    b0, b1, b2, b3 = payload[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = 4 - ((b1 >> 1) & 0x3)  # 1/2/3; (b1>>1)&3 == 0 is reserved
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    padding = (b2 >> 1) & 0x1
    if ver == 1 or layer == 4 or br_idx in (0, 15) or sr_idx == 3:
        return None
    rate = _MP3_SAMPLERATE[ver][sr_idx]
    kbps = _MP3_BITRATE[(3 if ver == 3 else 2, layer)][br_idx - 1]
    if layer == 1:
        spf = 384
        flen = (12 * kbps * 1000 // rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or ver == 3) else 576
        flen = spf // 8 * kbps * 1000 // rate + padding
    n_ch = 1 if ((b3 >> 6) & 0x3) == 3 else 2
    return flen, spf, rate, kbps, n_ch


def _is_mp3(payload: bytes) -> bool:
    """ID3v2-tagged or bare MPEG audio: either magic is decisive enough
    to route; decode_mp3_meta then validates the frame chain."""
    if payload[:3] == b"ID3":
        return True
    return _mp3_frame(payload, 0) is not None


def decode_mp3_meta(payload: bytes) -> dict:
    """REAL MPEG audio (MP3) framing metadata via a pure-Python frame
    walker — no codec libraries: skips an ID3v2 tag (syncsafe size),
    then chains frame headers (public MPEG-1/2/2.5 Layer I-III bitrate
    and sample-rate tables) to count frames and accumulate duration.
    Only the SAMPLE DATA (Huffman spectra + IMDCT synthesis) stays
    undecodable here.

    Requires >= 2 chained valid frames (a lone 4-byte sync match in
    arbitrary bytes is ~2^-11 noise). Returns {sample_rate, n_channels,
    n_frames, duration_sec, bitrate_kbps_mean, vbr, has_id3}.
    Malformed structures raise ValueError at this boundary, the same
    contract as the other decoders."""
    pos = 0
    has_id3 = False
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("MP3 ID3v2 tag truncated")
        sz = payload[6:10]
        if any(b & 0x80 for b in sz):
            raise ValueError("MP3 ID3v2 size not syncsafe")
        pos = 10 + ((sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3])
        if payload[5] & 0x10:  # footer-present flag
            pos += 10
        has_id3 = True
        if pos >= len(payload):
            raise ValueError("MP3 ID3v2 tag escapes the payload")
    n_frames = 0
    total_samples = 0
    rate = 0
    n_ch = 0
    kbps_sum = 0
    kbps_set: set[int] = set()
    while pos + 4 <= len(payload):
        frame = _mp3_frame(payload, pos)
        if frame is None:
            break
        flen, spf, rate_f, kbps, ch = frame
        if flen <= 4 or pos + flen > len(payload):
            break  # truncated final frame: keep what chained so far
        if n_frames == 0:
            rate, n_ch = rate_f, ch
        n_frames += 1
        total_samples += spf
        kbps_sum += kbps
        kbps_set.add(kbps)
        pos += flen
    if n_frames < 2:
        raise ValueError("MP3 frame chain too short (< 2 valid frames)")
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "n_frames": n_frames,
        "duration_sec": total_samples / rate,
        "bitrate_kbps_mean": kbps_sum / n_frames,
        "vbr": len(kbps_set) > 1,
        "has_id3": has_id3,
    }


def _mp3_features(meta: dict) -> tuple[int, int, np.ndarray]:
    """Framing-metadata features for MP3 (sample decode stubbed — the
    signal slots are 0): [duration_sec, n_frames, sample_rate/1000,
    bitrate_kbps_mean, vbr, zeros...]. Shape matches FEATURES_SCHEMA so
    MP3 rows flow through the same pipeline as fully-decoded media;
    (width, height) carries (n_channels, sample_rate//100), the WAV
    convention (see _audio_features)."""
    feats = np.zeros(FEATURE_DIM, dtype=np.float32)
    feats[0] = meta["duration_sec"]
    feats[1] = meta["n_frames"]
    feats[2] = meta["sample_rate"] / 1000.0
    feats[3] = meta["bitrate_kbps_mean"]
    feats[4] = 1.0 if meta["vbr"] else 0.0
    return meta["n_channels"], meta["sample_rate"] // 100, feats


def decode_media(payload: bytes, kind: str, deterministic_fake: bool = False):
    """Audio WAV, image BMP + PNG + JPEG and video Y4M payloads decode
    for REAL (pure-NumPy parsers above; PNG via stdlib zlib, JPEG via
    the baseline-DCT decoder), and MP4 containers / MP3 streams parse
    for real at the METADATA level (ISO-BMFF box walk, MPEG audio
    frame-header chain — see decode_mp4_meta / decode_mp3_meta); only
    MP4/MP3 SAMPLE decode needs codec libraries not in this container
    and stays stubbed behind ``deterministic_fake``. Swap in prod."""
    try:
        if kind == "audio" and _is_wav(payload):
            rate, _n_ch, samples = decode_wav(payload)
            return _audio_features(rate, samples)
        if kind == "audio" and _is_mp3(payload):
            return _mp3_features(decode_mp3_meta(payload))
        if kind == "image" and _is_bmp(payload):
            return _image_features(*decode_bmp(payload))
        if kind == "image" and _is_png(payload):
            return _image_features(*decode_png(payload))
        if kind == "image" and _is_jpeg(payload):
            return _image_features(*decode_jpeg(payload))
        if kind == "video" and _is_y4m(payload):
            return _video_features(*decode_y4m(payload))
        if kind == "video" and _is_mp4(payload):
            return _mp4_features(decode_mp4_meta(payload))
    except (ValueError, NotImplementedError):
        # every decoder translates malformed input to ValueError at its
        # parse boundary (JPEG included, see decode_jpeg), so anything
        # else here is a genuine decoder bug and must surface
        # header looked WAV/BMP/Y4M but the body is unsupported or malformed
        # (e.g. 24-bit PCM, truncated data chunk): in fake mode degrade to
        # the deterministic fake instead of aborting the whole Spark job;
        # in strict mode surface the real error
        if not deterministic_fake:
            raise
    if deterministic_fake:
        return _fake_decode(payload, kind)
    raise NotImplementedError(
        "unrecognized media framing, or MP3/MP4 SAMPLE decode: the "
        "compressed bitstreams require codec libraries not present in "
        "this environment; pass deterministic_fake=True to exercise "
        "the pipeline"
    )


def extract_media_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """media(media_id, kind, payload binary) → FEATURES_SCHEMA rows via
    mapInPandas (Arrow batches; binaries never leave the executors)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, kind, payload in zip(b["media_id"], b["kind"], b["payload"]):
                data = bytes(payload)
                w, h, feats = decode_media(data, kind, deterministic_fake)
                rows.append((mid, kind, len(data), w, h, feats.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "width", "height", "features"]
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (decode stubbed the same way). Demonstrates the explode-style
    fan-out shape used for video at scale."""
    from pyspark.sql import functions as F

    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.lit(10) * every_n, F.lit(every_n))).alias("frame_idx"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("luma_mean", FloatType()),
        StructField("luma_std", FloatType()),
    ]
)


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL video frame sampling: decode Y4M payloads on the executors
    and emit one row per sampled frame (every ``every_n``-th, always
    including frame 0) with per-frame luminance statistics.

    Same scale posture as ``extract_media_features``: Arrow-batched
    ``mapInPandas``, binaries never reach the driver, output rows are
    tiny fixed-width scalars so the fan-out (frames per video) shuffles
    cheaply. Non-Y4M video rows raise — compose with a filter or the
    fake-mode plan above for compressed formats."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, kind, payload in zip(b["media_id"], b["kind"], b["payload"]):
                if kind != "video":
                    continue
                _fps, frames = decode_y4m(bytes(payload))
                for i in range(0, len(frames), every_n):
                    rows.append(
                        (
                            mid,
                            i,
                            float(frames[i].mean()),
                            float(frames[i].std()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "luma_mean", "luma_std"]
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
