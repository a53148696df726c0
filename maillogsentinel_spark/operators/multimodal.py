"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed with Arrow-batched ``mapInPandas``.

EIGHT real decode paths exist end-to-end, all re-implemented from the
public specs with numpy + stdlib only — BMP (24/32 bpp uncompressed,
row padding, bottom-up and top-down, BGR→RGB); PNG (stdlib ``zlib``
inflate + numpy unfilter: all five filters, every depth the spec
defines for gray/RGB/RGBA/palette — 1/2/4/8/16-bit — sequential or
Adam7-interlaced); JPEG (operators/jpeg.py: baseline SOF0/1 and
progressive SOF2 per ITU-T T.81, 8-bit and 12-bit precision,
4:4:4/4:2:2/4:2:0 sampling, restart markers); GIF89a (operators/gif.py: variable-width LZW, interlace,
sub-frame compositing); WAV PCM (stdlib ``wave``, 8/16/24/32-bit);
G.711 μ-law AND A-law; IMA ADPCM and MS ADPCM (mono and
multi-channel).
``decode_image``/``decode_audio`` dispatch on magic bytes and raise
NotImplementedError only for variants that genuinely need codec libs
absent from this container (MP3, arithmetic/lossless JPEG);
``fake_feature_extractor`` remains as the deterministic stand-in for
an embed step so the rest of the plumbing — schema, batch shape,
partitioning — is testable regardless of format.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` modest for large blobs,
and partition by size (``repartitionByRange`` on meta.n_bytes) when
payloads are skewed.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bpp uncompressed BMP (BI_RGB): BGR byte
    order on disk, rows bottom-up and padded to 4 bytes — the format as
    published (Windows BITMAPFILEHEADER + BITMAPINFOHEADER)."""
    h, w, _ = pixels.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    img_size = (row_raw + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = bytearray()
    bgr = pixels[:, :, ::-1]  # RGB → BGR
    for r in range(h - 1, -1, -1):  # bottom-up
        body += bgr[r].tobytes() + b"\x00" * pad
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP → (H, W, 3) uint8 RGB. Handles 24/32 bpp uncompressed,
    bottom-up (positive height) and top-down (negative height) layouts,
    and 4-byte row padding. Pure numpy — no image libraries."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression} unsupported")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = []
    for r in range(h):
        off = pix_off + r * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=w * nch, offset=off)
        rows.append(row.reshape(w, nch)[:, :3][:, ::-1])  # BGR(A) → RGB
    img = np.stack(rows)
    return img if top_down else img[::-1]


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9, Filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_filter_lines(pixels: np.ndarray) -> bytearray:
    """Filter an (h, w, 3) block's scanlines with type (row % 5) —
    cycling None/Sub/Up/Average/Paeth — so a decoder that mishandles
    ANY filter type produces wrong pixels."""
    h, w, _ = pixels.shape
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int64)
    for r in range(h):
        cur = pixels[r].reshape(-1).astype(np.int64)
        ft = r % 5
        raw.append(ft)
        if ft == 0:  # None
            out = cur
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            out = (cur - left) % 256
        elif ft == 2:  # Up
            out = (cur - prev) % 256
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            out = (cur - (left + prev) // 2) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
            pred = np.array(
                [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prev, upleft)],
                dtype=np.int64,
            )
            out = (cur - pred) % 256
        raw += out.astype(np.uint8).tobytes()
        prev = cur
    return raw


def encode_png(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB → 8-bit truecolor PNG, hand-built from the
    public spec (W3C PNG / RFC 2083): IHDR + one zlib-deflated IDAT +
    IEND, CRC32 per chunk. ``interlace`` writes the seven Adam7 passes,
    each filtered as its own sub-image per spec §8.2 (empty passes
    contribute no bytes)."""
    h, w, _ = pixels.shape
    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in ADAM7_PASSES:
            sub = pixels[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += _png_filter_lines(sub)
    else:
        raw = _png_filter_lines(pixels)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


# Adam7 pass geometry: (x0, y0, dx, dy) per pass, spec §8.2.
ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(
    raw: bytes, off: int, h: int, w: int, nch: int, sample_bytes: int = 1
) -> tuple:
    """Unfilter h scanlines of w pixels × nch channels × sample_bytes
    starting at ``off`` (each scanline prefixed by its filter byte,
    spec §9 — filters operate on BYTES, with the left neighbor one
    whole pixel = nch*sample_bytes bytes back regardless of depth).
    Returns the (h, w*nch*sample_bytes) uint8 array and the offset past
    the consumed bytes."""
    bpp = nch * sample_bytes
    stride = w * bpp
    if off + h * (stride + 1) > len(raw):
        raise ValueError("PNG IDAT size mismatch")
    img = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        ft = raw[off]
        cur = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=off + 1
        ).astype(np.int64)
        off += stride + 1
        if ft == 0:
            pass
        elif ft == 2:  # Up — no left dependency, vectorized
            cur = (cur + prev) % 256
        elif ft in (1, 3, 4):  # Sub/Average/Paeth — left-sequential per pixel
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ft == 1:
                    cur[i] = (cur[i] + a) % 256
                elif ft == 3:
                    cur[i] = (cur[i] + (a + b) // 2) % 256
                else:
                    cur[i] = (cur[i] + _paeth(int(a), int(b), int(c))) % 256
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        img[r] = cur
        prev = cur
    return img.astype(np.uint8), off


def _png_unpack_subbyte(flat: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(h, row_bytes) unfiltered bytes → (h, w) samples for depth
    1/2/4: samples pack MSB-first within each byte (spec §7.2), with
    row padding bits discarded."""
    bits = np.unpackbits(flat, axis=1)
    h = flat.shape[0]
    weights = 1 << np.arange(depth - 1, -1, -1)
    samples = (bits.reshape(h, -1, depth) * weights).sum(axis=2)
    return samples[:, :w].astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (H, W, 3) uint8 RGB, pure stdlib-zlib + numpy. Supports
    8-bit grayscale (type 0, expanded to RGB), truecolor (type 2),
    truecolor+alpha (type 6, alpha dropped) and indexed (type 3,
    looked up through the PLTE chunk), each either sequential or
    Adam7-interlaced (the seven passes are independent sub-images,
    unfiltered separately per spec §8.2 then scattered onto the pixel
    grid), with all five scanline filters (None/Sub/Up/Average/Paeth)
    unfiltered per spec §9; IDAT chunks are concatenated before the
    single zlib inflate. 16-bit samples (gray/RGB/RGBA) decode for
    real and scale to the 8-bit output contract by taking the high
    byte (the spec's sample-depth rescale for display). SUB-BYTE
    depths (1/2/4-bit grayscale and palette) decode for real too:
    scanlines carry MSB-first packed samples with byte-granular
    filters (bpp rounds up to one byte, spec §9), rows unpack with
    padding bits dropped, grayscale rescales by 255/(2^d−1) exactly
    (×255/×85/×17). That completes PNG: every depth×color-type
    combination the spec defines for these color types decodes."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    pos, w, plte = 8, None, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            ok = (
                (depth == 8 and color in (0, 2, 3, 6))
                or (depth == 16 and color in (0, 2, 6))  # palette ≤ 8-bit
                or (depth in (1, 2, 4) and color in (0, 3))  # sub-byte
            )
            if not ok or interlace > 1:
                raise NotImplementedError(
                    f"PNG depth={depth} color_type={color} "
                    f"interlace={interlace} unsupported"
                )
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
        elif ctype == b"PLTE":
            if len(data) % 3 or not data:
                raise ValueError("invalid PNG PLTE length")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    nch = {0: 1, 2: 3, 3: 1, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))
    if depth < 8:
        # sub-byte: unfilter at byte granularity (bpp = 1 per spec §9),
        # then unpack MSB-first samples per row/pass
        if interlace == 0:
            row_bytes = (w * depth + 7) // 8
            flat, off = _png_unfilter(raw, 0, h, row_bytes, 1, 1)
            if off != len(raw):
                raise ValueError("PNG IDAT size mismatch")
            samp = _png_unpack_subbyte(flat, w, depth)
        else:
            samp = np.zeros((h, w), dtype=np.uint8)
            off = 0
            for x0, y0, dx, dy in ADAM7_PASSES:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                pass_bytes = (pw * depth + 7) // 8
                sub, off = _png_unfilter(raw, off, ph, pass_bytes, 1, 1)
                samp[y0::dy, x0::dx] = _png_unpack_subbyte(sub, pw, depth)
            if off != len(raw):
                raise ValueError("PNG IDAT size mismatch")
        if color == 3:
            if int(samp.max(initial=0)) >= len(plte):
                raise ValueError("PNG palette index outside PLTE")
            return plte[samp]
        # exact spec rescale: 255/(2^d - 1) is an integer for d=1/2/4
        gray = (samp.astype(np.int64) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
        return np.repeat(gray[:, :, None], 3, axis=2)
    sb = depth // 8  # bytes per sample
    if interlace == 0:
        flat, off = _png_unfilter(raw, 0, h, w, nch, sb)
        if off != len(raw):
            raise ValueError("PNG IDAT size mismatch")
        px = flat.reshape(h, w, nch * sb)
    else:
        px = np.zeros((h, w, nch * sb), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes no bytes at all
            sub, off = _png_unfilter(raw, off, ph, pw, nch, sb)
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, nch * sb)
        if off != len(raw):
            raise ValueError("PNG IDAT size mismatch")
    if sb == 2:
        # 16-bit samples are big-endian (spec §7.1): the high byte IS
        # the 8-bit rescale for display
        px = px.reshape(h, w, nch, 2)[:, :, :, 0]
    if color == 3:
        if int(px.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index outside PLTE")
        return plte[px[:, :, 0]]
    if nch == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3]


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def mulaw_expand(codes: np.ndarray) -> np.ndarray:
    """G.711 μ-law bytes → int16 linear PCM, vectorized numpy transcription
    of the published CCITT reference expansion (bias 0x84, 3-bit segment,
    4-bit mantissa): t = ((~u & 0xF) << 3 | bias) << seg, sign from the
    inverted code's top bit. Range ±32124; codes 0x7F/0xFF are ∓0."""
    u = np.invert(np.asarray(codes, dtype=np.uint8))
    t = (((u & 0x0F).astype(np.int32) << 3) + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def alaw_expand(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes → int16 linear PCM, vectorized numpy
    transcription of the published CCITT reference expansion: XOR the
    0x55 toggle, 3-bit segment, 4-bit mantissa; segment 0 adds the
    half-step 8, higher segments add 0x108 and shift by (seg-1); the
    POST-toggle sign bit set means positive (opposite of μ-law's
    convention). Range ±32256; codes 0xD5/0x55 are ±8 (A-law has no
    true zero)."""
    a = np.asarray(codes, dtype=np.uint8) ^ 0x55
    seg = ((a & 0x70) >> 4).astype(np.int32)
    mant = (a & 0x0F).astype(np.int32)
    t = np.where(
        seg == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


def encode_wav_alaw(codes: np.ndarray, sample_rate: int = 8000) -> bytes:
    """A-law bytes → RIFF/WAVE with format tag 6 (WAVE_FORMAT_ALAW).
    Hand-built RIFF, same shape as encode_wav_ulaw."""
    data = np.asarray(codes, dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 6, 1, sample_rate, sample_rate, 1, 8)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


_ULAW_SEG_ENDS = np.array(
    [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], dtype=np.int32
)


def mulaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM → G.711 μ-law bytes (the reference compressor:
    bias, segment lookup, mantissa extract, complement). Inverse of
    mulaw_expand up to the codec's quantization grid."""
    x = np.asarray(samples, dtype=np.int32)
    neg = x < 0
    mag = np.minimum(np.where(neg, 0x84 - x, x + 0x84), 0x7FFF)
    seg = np.searchsorted(_ULAW_SEG_ENDS, mag)
    uval = (seg << 4) | ((mag >> (seg + 3)) & 0x0F)
    return (uval ^ np.where(neg, 0x7F, 0xFF)).astype(np.uint8)


def encode_wav_ulaw(codes: np.ndarray, sample_rate: int = 8000) -> bytes:
    """μ-law bytes → RIFF/WAVE with format tag 7 (WAVE_FORMAT_MULAW).
    Hand-built RIFF: the stdlib wave module only writes PCM."""
    data = np.asarray(codes, dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 7, 1, sample_rate, sample_rate, 1, 8)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE → (sample_rate, samples). PCM via the stdlib wave
    module (16-bit → int16; 8-bit is unsigned by spec → uint8; 24-bit
    sign-extends to int32; 32-bit → int32); μ-law (format tag 7),
    A-law (tag 6), MS ADPCM (tag 2) and IMA ADPCM (tag 0x11) via a
    minimal RIFF chunk walk. Multi-channel frames come back shaped
    (n_frames, n_channels)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            rate, nch, width = (
                f.getframerate(), f.getnchannels(), f.getsampwidth(),
            )
            raw = f.readframes(f.getnframes())
    except wave.Error:
        return _decode_wav_nonpcm(payload)
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2")
    elif width == 1:
        arr = np.frombuffer(raw, dtype=np.uint8)
    elif width == 3:
        # 24-bit little-endian signed: assemble and sign-extend bit 23
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        arr = np.where(v & 0x800000, v - (1 << 24), v).astype(np.int32)
    elif width == 4:
        arr = np.frombuffer(raw, dtype="<i4")
    else:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    return rate, arr.reshape(-1, nch) if nch > 1 else arr


def _decode_wav_nonpcm(payload: bytes) -> tuple[int, np.ndarray]:
    """Chunk-walking fallback for format tags the wave module rejects;
    decodes μ-law (tag 7), A-law (tag 6), MS ADPCM (tag 2) and IMA
    ADPCM (tag 0x11) for real, gates the rest (e.g. MPEG-in-WAV tag
    0x50) honestly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, fact_n = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + sz > len(payload):
            # uint8 mu-law data never trips a frombuffer size error, so a
            # short slice would silently return fewer samples — enforce
            # the truncated-payload-raises contract the PCM path has.
            raise ValueError("truncated WAV payload")
        if cid == b"fmt ":
            fmt = payload[pos + 8 : pos + 8 + sz]
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + sz]
        elif cid == b"fact" and sz >= 4:
            (fact_n,) = struct.unpack_from("<I", payload, pos + 8)
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, nch, rate = struct.unpack_from("<HHI", fmt, 0)
    if tag in (0x02, 0x11):
        dec = _decode_wav_ms_adpcm if tag == 0x02 else _decode_wav_ima
        arr = dec(fmt, data)
        # the fact chunk carries the true sample count — a short final
        # block is zero-padded to block_align at encode time, and the
        # pad nibbles must not decode as trailing samples
        return rate, arr[:fact_n] if fact_n is not None else arr
    if tag not in (6, 7):
        raise NotImplementedError(
            f"WAV format tag {tag} unsupported (PCM, mu-law, A-law, "
            "IMA and MS ADPCM decode)"
        )
    expand = mulaw_expand if tag == 7 else alaw_expand
    arr = expand(np.frombuffer(data, dtype=np.uint8))
    return rate, arr.reshape(-1, nch) if nch > 1 else arr


# IMA/DVI ADPCM (WAVE format tag 0x11) — tables from the public IMA
# "Recommended Practices for Enhancing Digital Audio Compatibility"
# (rev 3.00, 1992; the same tables appear in RFC 3551 §4.5.1's DVI4
# lineage). 4-bit nibbles, shift-accumulate dequantizer, 89-step table.
IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_nibbles(
    nibbles: np.ndarray, predictor: int, index: int
) -> np.ndarray:
    """Core IMA recurrence: shift-accumulate dequantize, clamp predictor
    to int16, clamp step index to [0, 88]. Sequential by nature (each
    output feeds the next step size) — per-payload cost is O(samples),
    and payloads are decoded batch-parallel inside mapInPandas."""
    out = np.empty(len(nibbles), dtype=np.int16)
    pred, idx = int(predictor), int(index)
    st, it = IMA_STEP_TABLE, IMA_INDEX_TABLE
    for i, n in enumerate(nibbles):
        n = int(n)
        step = int(st[idx])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(it[n & 7])))
        out[i] = pred
    return out


def _ima_encode_nibbles(
    samples: np.ndarray, predictor: int, index: int
) -> np.ndarray:
    """IMA quantizer (inverse of _ima_decode_nibbles' recurrence): pick
    the nibble whose dequantized diff tracks the input, updating the
    same predictor/step state the decoder will replay."""
    out = np.empty(len(samples), dtype=np.uint8)
    pred, idx = int(predictor), int(index)
    st, it = IMA_STEP_TABLE, IMA_INDEX_TABLE
    for i, x in enumerate(np.asarray(samples, dtype=np.int32)):
        step = int(st[idx])
        delta = int(x) - pred
        n = 8 if delta < 0 else 0
        if n:
            delta = -delta
        if delta >= step:
            n |= 4
            delta -= step
        if delta >= step >> 1:
            n |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            n |= 1
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(it[n & 7])))
        out[i] = n
    return out


# MS ADPCM (WAVE format tag 0x02) — constants from the published
# Microsoft "Multimedia Programming Interface and Data Specifications"
# ADPCM algorithm (the same tables appear in every open decoder).
MS_ADAPTATION = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614,
     768, 614, 512, 409, 307, 230, 230, 230], dtype=np.int32
)
MS_COEFF1 = np.array([256, 512, 0, 192, 240, 460, 392], dtype=np.int32)
MS_COEFF2 = np.array([0, -256, 0, 64, 0, -208, -232], dtype=np.int32)


def _ms_decode_block(block: bytes) -> np.ndarray:
    """One mono MS ADPCM block → int16 samples: 7-byte header
    (predictor index, initial idelta, the two seed samples stored
    newest-first) then 4-bit signed codes, HIGH nibble first."""
    if len(block) < 7:
        raise ValueError("truncated MS ADPCM block header")
    bpred = block[0]
    if bpred >= len(MS_COEFF1):
        raise ValueError("MS ADPCM predictor index out of range")
    idelta, s1, s2 = struct.unpack_from("<hhh", block, 1)
    c1, c2 = int(MS_COEFF1[bpred]), int(MS_COEFF2[bpred])
    packed = np.frombuffer(block[7:], dtype=np.uint8)
    codes = np.empty(2 * len(packed), dtype=np.uint8)
    codes[0::2] = packed >> 4
    codes[1::2] = packed & 0x0F
    out = [np.int16(s2), np.int16(s1)]  # seeds emit oldest-first
    for c in codes:
        c = int(c)
        s = c - 16 if c >= 8 else c  # signed 4-bit code
        pred = (s1 * c1 + s2 * c2) >> 8
        new = max(-32768, min(32767, pred + idelta * s))
        s2, s1 = s1, new
        idelta = max(16, (int(MS_ADAPTATION[c]) * idelta) >> 8)
        out.append(np.int16(new))
    return np.array(out, dtype=np.int16)


def _ms_decode_block_multi(block: bytes, nch: int) -> np.ndarray:
    """One multi-channel MS ADPCM block → (frames, nch) int16. The
    header groups each field across channels (all predictor indices,
    then all ideltas, then all samp1s, then all samp2s — 7*nch bytes);
    the 4-bit codes then alternate channels sample-by-sample, high
    nibble first."""
    if len(block) < 7 * nch:
        raise ValueError("truncated MS ADPCM block header")
    bpreds = list(block[:nch])
    if any(b >= len(MS_COEFF1) for b in bpreds):
        raise ValueError("MS ADPCM predictor index out of range")
    ideltas = list(struct.unpack_from(f"<{nch}h", block, nch))
    s1s = list(struct.unpack_from(f"<{nch}h", block, 3 * nch))
    s2s = list(struct.unpack_from(f"<{nch}h", block, 5 * nch))
    c1s = [int(MS_COEFF1[b]) for b in bpreds]
    c2s = [int(MS_COEFF2[b]) for b in bpreds]
    packed = np.frombuffer(block[7 * nch :], dtype=np.uint8)
    codes = np.empty(2 * len(packed), dtype=np.uint8)
    codes[0::2] = packed >> 4
    codes[1::2] = packed & 0x0F
    frames = [list(s2s), list(s1s)]  # seeds emit oldest-first per channel
    cur = []
    for i, c in enumerate(codes):
        ch = i % nch
        c = int(c)
        s = c - 16 if c >= 8 else c
        pred = (s1s[ch] * c1s[ch] + s2s[ch] * c2s[ch]) >> 8
        new = max(-32768, min(32767, pred + ideltas[ch] * s))
        s2s[ch], s1s[ch] = s1s[ch], new
        ideltas[ch] = max(16, (int(MS_ADAPTATION[c]) * ideltas[ch]) >> 8)
        cur.append(new)
        if ch == nch - 1:
            frames.append(cur)
            cur = []
    return np.array(frames, dtype=np.int16)


def _decode_wav_ms_adpcm(fmt: bytes, data: bytes) -> np.ndarray:
    """WAV tag-2 block walk → int16 samples. Mono keeps the original
    single-state path; multi-channel uses the grouped header + channel-
    alternating code stream. Returns 1-D mono / frame-major (n, nch)."""
    tag, nch, _rate = struct.unpack_from("<HHI", fmt, 0)
    block_align = struct.unpack_from("<H", fmt, 12)[0]
    if nch < 1:
        raise ValueError("MS ADPCM channel count must be >= 1")
    if block_align < 8 * nch - 1:
        raise ValueError("inconsistent MS ADPCM block geometry")
    spb = (block_align - 7 * nch) * 2 // nch + 2
    if len(fmt) >= 20:
        declared = struct.unpack_from("<H", fmt, 18)[0]
        if declared > spb:
            raise ValueError("inconsistent MS ADPCM block geometry")
    out = []
    for off in range(0, len(data), block_align):
        blk = data[off : off + block_align]
        if nch == 1:
            out.append(_ms_decode_block(blk))
        else:
            out.append(_ms_decode_block_multi(blk, nch))
    return np.concatenate(out, axis=0).astype(np.int16)


def _ms_encode_nibbles(samples: np.ndarray, idelta: int) -> bytes:
    """Quantize samples[2:] against the predictor-0 recurrence
    (coeff 256/0: pred = previous sample), replaying the decoder's
    state updates so both sides stay in lockstep."""
    s2, s1 = int(samples[0]), int(samples[1])
    codes = []
    for x in np.asarray(samples[2:], dtype=np.int32):
        pred = (s1 * 256 + s2 * 0) >> 8
        s = max(-8, min(7, int(round((int(x) - pred) / idelta))))
        c = s + 16 if s < 0 else s
        new = max(-32768, min(32767, pred + idelta * s))
        s2, s1 = s1, new
        idelta = max(16, (int(MS_ADAPTATION[c]) * idelta) >> 8)
        codes.append(c)
    if len(codes) % 2:
        codes.append(0)
    return bytes((codes[i] << 4) | codes[i + 1] for i in range(0, len(codes), 2))


def encode_wav_ms_adpcm(
    samples: np.ndarray, sample_rate: int = 8000, block_align: int = 39
) -> bytes:
    """int16 samples → RIFF/WAVE with format tag 2 (MS ADPCM),
    predictor 0, per-block initial idelta estimated from the block's
    mean step. Mono (1-D): (block_align - 7) * 2 + 2 samples per
    block. Multi-channel ((n, nch)): grouped per-field header (all
    predictor indices, all ideltas, all samp1s, all samp2s), then the
    code stream alternating channels sample-by-sample, high nibble
    first. Short final blocks pad by repeating the last frame."""
    samples = np.asarray(samples, dtype=np.int16)
    nch = 1 if samples.ndim == 1 else samples.shape[1]
    spb = (block_align - 7 * nch) * 2 // nch + 2
    blocks = []
    for off in range(0, len(samples), spb):
        if nch == 1:
            chunk = np.asarray(samples[off : off + spb], dtype=np.int32)
            if len(chunk) < 2:
                chunk = np.append(chunk, chunk[-1] if len(chunk) else 0)
            steps = np.abs(np.diff(chunk)) if len(chunk) > 1 else np.array([16])
            idelta = max(16, int(steps.mean()) // 4 or 16)
            body = struct.pack("<Bhhh", 0, idelta, int(chunk[1]), int(chunk[0]))
            body += _ms_encode_nibbles(chunk, idelta)
            blocks.append(body.ljust(block_align, b"\x00"))
            continue
        chunk = np.asarray(samples[off : off + spb], dtype=np.int32)
        if len(chunk) < spb:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], spb - len(chunk), axis=0)]
            )
        ideltas, s1s, s2s = [], [], []
        for ch in range(nch):
            steps = np.abs(np.diff(chunk[:, ch]))
            ideltas.append(max(16, int(steps.mean()) // 4 or 16))
            s2s.append(int(chunk[0, ch]))
            s1s.append(int(chunk[1, ch]))
        body = bytes(nch)  # predictor 0 per channel
        body += struct.pack(f"<{nch}h", *ideltas)
        body += struct.pack(f"<{nch}h", *s1s)
        body += struct.pack(f"<{nch}h", *s2s)
        st1, st2, di = list(s1s), list(s2s), list(ideltas)
        codes = []
        for fr in range(2, spb):
            for ch in range(nch):
                pred = (st1[ch] * 256 + st2[ch] * 0) >> 8
                x = int(chunk[fr, ch])
                s = max(-8, min(7, int(round((x - pred) / di[ch]))))
                c = s + 16 if s < 0 else s
                new = max(-32768, min(32767, pred + di[ch] * s))
                st2[ch], st1[ch] = st1[ch], new
                di[ch] = max(16, (int(MS_ADAPTATION[c]) * di[ch]) >> 8)
                codes.append(c)
        if len(codes) % 2:
            codes.append(0)
        body += bytes(
            (codes[i] << 4) | codes[i + 1] for i in range(0, len(codes), 2)
        )
        blocks.append(body.ljust(block_align, b"\x00"))
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH", 2, nch, sample_rate,
        sample_rate * block_align // spb, block_align, 4, 2, spb,
    )
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, len(samples))
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima(
    samples: np.ndarray,
    sample_rate: int = 8000,
    block_align: int = 36,
    initial_index: int = 0,
) -> bytes:
    """int16 samples → RIFF/WAVE with format tag 0x11 (IMA ADPCM).
    Mono (1-D input): each block stores a 4-byte header (true first
    sample as the int16 predictor, step index, reserved) + 4-bit
    nibbles two-per-byte, low nibble first — (block_align - 4) * 2 + 1
    samples per block. Multi-channel ((n, nch) input): one 4-byte
    header PER CHANNEL, then per-channel nibbles interleaved in 4-byte
    words (8 samples a channel at a time) — the public IMA/Microsoft
    WAVE layout; block_align must leave a 4*nch multiple of data
    bytes. Short final blocks pad by repeating the last frame."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        nch = 1
        spb = (block_align - 4) * 2 + 1
    else:
        nch = samples.shape[1]
        if (block_align - 4 * nch) % (4 * nch):
            raise ValueError("block_align must leave a 4*nch data multiple")
        spb = (block_align - 4 * nch) * 2 // nch + 1
    blocks = []
    idx = [int(initial_index)] * nch
    for off in range(0, len(samples), spb):
        chunk = samples[off : off + spb]
        if nch == 1:
            pred = int(chunk[0])
            nib = _ima_encode_nibbles(chunk[1:], pred, idx[0])
            if len(nib) % 2:
                nib = np.append(nib, 0)
            packed = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
            body = struct.pack("<hBB", pred, idx[0], 0) + packed.tobytes()
            blocks.append(body.ljust(block_align, b"\x00"))
            continue
        if len(chunk) < spb:  # repeat-last-frame pad
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], spb - len(chunk), axis=0)]
            )
        hdr = b""
        ch_bytes = []
        for ch in range(nch):
            pred = int(chunk[0, ch])
            nib = _ima_encode_nibbles(chunk[1:, ch], pred, idx[ch])
            packed = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
            hdr += struct.pack("<hBB", pred, idx[ch], 0)
            ch_bytes.append(packed.reshape(-1, 4))
        words = np.stack(ch_bytes, axis=1)  # (ngroups, nch, 4)
        blocks.append(hdr + words.reshape(-1).tobytes())
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, nch, sample_rate,
        sample_rate * block_align // spb, block_align, 4, 2, spb,
    )
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, len(samples))
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav_ima(fmt: bytes, data: bytes) -> np.ndarray:
    """WAV tag-0x11 block walk → int16 samples. Mono AND multi-channel:
    each block carries a 4-byte header PER CHANNEL (predictor sample,
    step index, reserved), then the nibble stream interleaves in 4-byte
    words per channel (8 samples of channel 0, 8 of channel 1, ... —
    the layout in the public IMA/Microsoft WAVE extension). Returns 1-D
    for mono, frame-major (n, nch) otherwise."""
    tag, nch, _rate = struct.unpack_from("<HHI", fmt, 0)
    block_align = struct.unpack_from("<H", fmt, 12)[0]
    if nch < 1:
        raise ValueError("IMA ADPCM channel count must be >= 1")
    hdr = 4 * nch
    if len(fmt) >= 20:
        spb = struct.unpack_from("<H", fmt, 18)[0]
    else:
        spb = (block_align - hdr) * 2 // nch + 1
    if block_align < hdr + (4 * nch if nch > 1 else 1):
        raise ValueError("inconsistent IMA ADPCM block geometry")
    if spb > (block_align - hdr) * 2 // nch + 1:
        raise ValueError("inconsistent IMA ADPCM block geometry")
    if nch > 1 and (block_align - hdr) % (4 * nch):
        raise ValueError("inconsistent IMA ADPCM block geometry")
    out = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < hdr:
            raise ValueError("truncated IMA ADPCM block header")
        preds, idxs = [], []
        for ch in range(nch):
            pred, idx, _rsvd = struct.unpack_from("<hBB", block, 4 * ch)
            if idx > 88:
                raise ValueError("IMA ADPCM step index out of range")
            preds.append(pred)
            idxs.append(idx)
        if nch == 1:
            want = min(spb, 1 + (len(block) - 4) * 2) - 1
            packed = np.frombuffer(
                block[4 : 4 + (want + 1) // 2], dtype=np.uint8
            )
            nib = np.empty(2 * len(packed), dtype=np.uint8)
            nib[0::2] = packed & 0x0F
            nib[1::2] = packed >> 4
            out.append(np.atleast_1d(np.int16(preds[0])))
            out.append(_ima_decode_nibbles(nib[:want], preds[0], idxs[0]))
            continue
        body = np.frombuffer(block[hdr:], dtype=np.uint8)
        usable = (len(body) // (4 * nch)) * (4 * nch)
        words = body[:usable].reshape(-1, nch, 4)
        chans = []
        for ch in range(nch):
            bts = words[:, ch, :].reshape(-1)
            nib = np.empty(2 * len(bts), dtype=np.uint8)
            nib[0::2] = bts & 0x0F
            nib[1::2] = bts >> 4
            want = min(spb - 1, len(nib))
            dec = np.concatenate(
                [[np.int16(preds[ch])],
                 _ima_decode_nibbles(nib[:want], preds[ch], idxs[ch])]
            )
            chans.append(dec[:spb])
        out.append(np.stack(chans, axis=1))  # frame-major (spb, nch)
    if nch == 1:
        return np.concatenate(out).astype(np.int16)
    return np.concatenate(out, axis=0).astype(np.int16)


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch: BMP (decode_bmp), PNG (decode_png, stdlib
    zlib + numpy unfilter — every depth 1/2/4/8/16 × gray/RGB/RGBA/
    palette combination the spec defines, sequential or Adam7), JPEG
    (operators/jpeg.py — baseline SOF0/1 AND progressive SOF2 per
    T.81, 8/12-bit, at any sampling-factor combination including
    non-integer ratios) and GIF (operators/gif.py — real
    variable-width LZW, interlaced and composited sub-frames) decode
    for real. The remaining TRUE gates raise inside their codec —
    arithmetic/lossless/hierarchical JPEG, exotic BMP variants — and
    unknown magic raises here."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(payload)
    raise NotImplementedError(
        "unknown image magic; BMP/PNG/baseline-JPEG/GIF decode without libs"
    )


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """Magic-byte dispatch: RIFF/WAVE decodes for real (decode_wav).

    MP3 stays a TRUE gate after investigation (round 10): an MPEG-1
    audio decoder needs the standard's NORMATIVE tables, which are
    neither formula-derivable nor reconstructible offline — the
    512-coefficient synthesis window (ISO 11172-3 Table 3-B.3, a
    hand-tuned table that famously differs from its own prototype-
    filter formula), the Layer III Huffman code tables (3-B.7, 34
    tables), the scalefactor-band partitions (3-B.8, per sample rate)
    and the Layer II bit-allocation tables (3-B.2a-d). The DSP halves
    that ARE formula-specified (the 32-band matrixing DCT
    cos((16+i)(2k+1)π/64), the 36-point IMDCT, the eight alias-
    reduction coefficients) would decode nothing without them — the
    same offline-unreachable class as arithmetic JPEG's QM-coder Qe
    table, and unlike every WAV-family codec here (PCM, G.711 μ/A-law,
    IMA and MS ADPCM), whose published tables fit in source."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        "only WAV decodes without audio libs; MP3 needs ISO 11172-3's "
        "normative window/Huffman/allocation tables (not formula-"
        "derivable, unreachable offline); FLAC needs codec libs"
    )


def fake_feature_extractor(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decode+embed step: cheap byte stats."""
    if payload is None or len(payload) == 0:
        return [0.0, 0.0, 0.0]
    return [float(len(payload)), float(payload[0]), float(payload[-1])]


def attach_binary(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    mime: str = "text/plain",
) -> DataFrame:
    """Wrap a column as an opaque media payload + typed metadata —
    the canonical multimodal row shape."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"), F.octet_length(payload).cast("long").alias("n_bytes")
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame,
    extractor: Callable[[bytes], list[float]] = fake_feature_extractor,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "features": pdf["payload"].map(extractor),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def resize_nn(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W, C) image to (height,
    width, C) — pixel-center mapping (src = floor((dst+0.5)·S/D)), the
    standard NN convention, pure numpy fancy indexing. Exact for
    integer upscales (each source pixel replicates), which is what the
    oracle query pins; fractional mappings are pytest-pinned."""
    h, w = pixels.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(int), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(int), w - 1)
    return pixels[rows][:, cols]


def real_resizer(payload: bytes, width: int, height: int) -> bytes:
    """decode → nearest-neighbor resize → re-encode as PNG: the REAL
    resize path for any format decode_image handles (BMP/PNG/baseline
    JPEG). PNG on the way out because it is lossless — the resized
    pixels survive the sink byte-exact. Swap for a PIL/opencv bilinear
    on a cluster with the libs; the Spark plumbing (resize_media) is
    identical to fake_resizer's."""
    return encode_png(resize_nn(decode_image(payload), width, height))


def fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: truncates /
    zero-pads the payload to width*height bytes. Swap for a real
    PIL/opencv resize on a cluster with the libs; the Spark plumbing
    (schema, batching, metadata propagation) is identical."""
    target = width * height
    if payload is None:
        payload = b""
    return payload[:target] + b"\x00" * max(0, target - len(payload))


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] = fake_resizer,
) -> DataFrame:
    """Arrow-batched image resize over binary payloads, propagating the
    typed metadata struct with the new dimensions.

    Scale: pure map — no shuffle; payload bytes move once through Arrow.
    Real decode is stubbed (``decode_image``) per environment limits.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(lambda b: resizer(b, width, height))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "meta": [
                        {
                            "mime": m["mime"] if m else None,
                            "n_bytes": len(p),
                            "width": width,
                            "height": height,
                        }
                        for m, p in zip(pdf["meta"], out)
                    ],
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType()),
    ]
)


def fake_frame_decoder(payload: bytes, frame_size: int) -> list[bytes]:
    """Deterministic stand-in for a video demuxer: fixed-size chunks."""
    if payload is None:
        return []
    return [
        payload[i : i + frame_size]
        for i in range(0, len(payload), frame_size)
    ]


def sample_frames(
    media: DataFrame,
    every_nth: int = 2,
    frame_size: int = 16,
    decoder: Callable[[bytes, int], "list[bytes]"] = fake_frame_decoder,
) -> DataFrame:
    """Video frame sampling: one input row fans out to every Nth frame
    (a flat-map — ``mapInPandas`` yields more rows than it consumes).

    Scale: fan-out happens task-locally; downstream per-frame work sees
    ordinary rows. For real video, swap ``decoder`` for an av/ffmpeg
    demux — signature and batch shape unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, fr in enumerate(decoder(payload, frame_size)):
                    if i % every_nth == 0:
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(fr)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_mean", T.DoubleType()),
        T.StructField("tl_r", T.IntegerType()),
        T.StructField("row0_r_sum", T.LongType()),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decode → per-image stats. tl_r (top-left
    red channel) and row0_r_sum are layout-sensitive on purpose: a
    missed bottom-up flip or BGR swap changes them, so the DuckDB oracle
    catches decoder bugs, not just byte counts."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                h, w, _ = img.shape
                flat = img.astype(np.int64)
                rows.append(
                    (
                        mid, w, h, int(flat.sum()),
                        float(flat.sum()) / (h * w * 3),
                        int(img[0, 0, 0]), int(flat[0, :, 0].sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "px_sum", "px_mean",
                    "tl_r", "row0_r_sum",
                ],
            )

    return media.mapInPandas(run, IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("amp_sum", T.LongType()),
        T.StructField("first_sample", T.IntegerType()),
        T.StructField("max_abs", T.IntegerType()),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL WAV decode → per-clip stats (signed int16
    semantics exercise the PCM parse, not just the header)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = decode_audio(bytes(payload))
                s = samples.astype(np.int64)
                rows.append(
                    (
                        mid, rate, len(s), int(s.sum()),
                        int(s[0]) if len(s) else 0, int(np.abs(s).max()) if len(s) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples", "amp_sum",
                    "first_sample", "max_abs",
                ],
            )

    return media.mapInPandas(run, AUDIO_STATS_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_samples int, sum_sq long, zero_crossings int, "
    "peak int"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched DSP features over REAL WAV decode: energy
    (sum of squares — integer-exact, the RMS numerator), zero-crossing
    count (sign boundary: negative vs non-negative, so silence at 0 is
    unambiguous), and peak amplitude. These are the frame-level
    features an audio-corpus pipeline gates on (silence/clipping
    detection) before expensive model passes; all integer arithmetic,
    so an oracle can pin them exactly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, samples = decode_audio(bytes(payload))
                s = samples.astype(np.int64)
                neg = s < 0
                zc = int((neg[1:] != neg[:-1]).sum()) if len(s) > 1 else 0
                rows.append(
                    (
                        mid, len(s), int((s * s).sum()), zc,
                        int(np.abs(s).max()) if len(s) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "sum_sq", "zero_crossings",
                    "peak",
                ],
            )

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)
