"""GIF87a/89a codec — pure stdlib + numpy, written from the published
CompuServe GIF89a specification (logical screen descriptor, global/local
color tables, sub-block framing, and the variable-code-width LZW scheme
of its Appendix F). No image libraries.

Supported for real: single-frame images — interlaced or not (the
four-pass row order of Appendix E) — with a global or local color
table, any palette size up to 256, extensions (graphic control,
comment, application) skipped per the sub-block framing rules, LZW
code widths 3..12 with table freeze at 4096 entries.

Honest gates (raise instead of guessing): sub-frame geometry and a
missing color table raise NotImplementedError / ValueError.

Width-synchronization note (the classic LZW off-by-one trap): the
decoder's string table lags the encoder's by exactly one entry at every
code boundary, so both sides derive the current code width from "the
largest code the encoder could emit next" — ``next_free - 1`` on the
encoder (it may emit the entry it just added) and ``next_free`` on the
decoder (whose next_free IS the encoder's just-added entry). Both
reduce to ``max(min_code+1, min(12, bit_length(x)))`` of the same
value, so the widths agree by construction; the hand-packed bitstream
vector in tests/test_multimodal_codecs.py pins it independently.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_TABLE = 4096  # 12-bit code ceiling, per the spec


def _lzw_compress(indices: bytes, min_code: int) -> bytes:
    """GIF-flavored LZW: emits CLEAR, variable-width codes (LSB-first
    bit packing), EOI. Table keyed (prefix_code, byte) -> code; frozen
    at 4096 entries (no mid-stream CLEAR needed for our payloads, and
    freezing is what most real encoders do)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0

    def width(largest: int) -> int:
        return max(min_code + 1, min(12, largest.bit_length()))

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_free = eoi + 1
    emit(clear, width(next_free - 1))
    prev = -1
    for k in indices:
        if prev < 0:
            prev = k
            continue
        got = table.get((prev, k))
        if got is not None:
            prev = got
            continue
        emit(prev, width(next_free - 1))
        if next_free < _MAX_TABLE:
            table[(prev, k)] = next_free
            next_free += 1
        prev = k
    if prev >= 0:
        emit(prev, width(next_free - 1))
    emit(eoi, width(next_free - 1))
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code: int, n_pixels: int) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    base = [bytes([i]) for i in range(clear)]
    acc = nbits = pos = 0
    table: list[bytes] = []
    next_free = eoi + 1
    prev: bytes | None = None
    out = bytearray()

    def read() -> int:
        nonlocal acc, nbits, pos
        w = max(min_code + 1, min(12, next_free.bit_length()))
        while nbits < w:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << w) - 1)
        acc >>= w
        nbits -= w
        return code

    def entry(code: int) -> bytes:
        if code < clear:
            return base[code]
        i = code - eoi - 1
        if 0 <= i < len(table):
            return table[i]
        raise ValueError(f"LZW code {code} out of range")

    while len(out) < n_pixels:
        code = read()
        if code == clear:
            table.clear()
            next_free = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            cur = entry(code)
        elif code == next_free:  # cScSc: the entry being defined
            cur = prev + prev[:1]
        else:
            cur = entry(code)
        if prev is not None and next_free < _MAX_TABLE:
            table.append(prev + cur[:1])
            next_free += 1
        out += cur
        prev = cur
    if len(out) < n_pixels:
        raise ValueError(f"LZW underrun: {len(out)} of {n_pixels} pixels")
    return bytes(out[:n_pixels])


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB with ≤256 distinct colors → single-frame
    GIF89a: global color table (lexicographically sorted for
    determinism), real LZW sub-blocks; ``interlace`` writes the rows in
    the spec's four-pass order with the descriptor flag set."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF palette limited to 256 colors, got {len(palette)}")
    gct_bits = max(1, int(len(palette) - 1).bit_length())  # 2^gct_bits entries
    table = np.zeros((1 << gct_bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code = max(2, gct_bits)  # spec: LZW min code size >= 2
    rows = indices.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = rows[_interlace_order(h)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )  # no LCT
    out.append(min_code)
    lzw = _lzw_compress(rows.reshape(-1).tobytes(), min_code)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF → (H, W, 3) uint8 RGB (first frame). Skips extension blocks,
    honors a local color table over the global one, gates interlace.
    Truncated payloads raise ValueError (the codecs' honest-gate
    contract), never a bare IndexError from mid-parse."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_inner(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated GIF payload: {e}") from e


def _decode_gif_inner(payload: bytes) -> np.ndarray:
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label, then sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        il, it, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if il + w > sw or it + h > sh:
            raise ValueError(
                "GIF image descriptor exceeds the logical screen: "
                f"image {w}x{h}@({il},{it}) vs screen {sw}x{sh}"
            )
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if palette is None:
            raise ValueError("GIF image without a color table")
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos]:
            n = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = np.frombuffer(
            _lzw_decompress(bytes(lzw), min_code, w * h), np.uint8
        )
        if idx.max(initial=0) >= len(palette):
            raise ValueError("GIF pixel index outside color table")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:
            # interlaced: the stream stores rows in the four-pass order
            # of GIF89a Appendix E (every 8th from 0, every 8th from 4,
            # every 4th from 2, every 2nd from 1) — scatter stored row
            # j back to display row _interlace_order(h)[j]
            out = np.empty_like(rows)
            out[_interlace_order(h)] = rows
            rows = out
        frame = palette[rows.reshape(-1)].reshape(h, w, 3)
        if (il, it) != (0, 0) or (w, h) != (sw, sh):
            # sub-frame inside the logical screen: composite over the
            # background color (LSD byte 11 indexes the GLOBAL table;
            # without a GCT the spec leaves the backdrop undefined, so
            # refuse rather than guess a color)
            if gct is None or bg >= len(gct):
                raise NotImplementedError(
                    "GIF sub-frame without a global background color"
                )
            screen = np.broadcast_to(gct[bg], (sh, sw, 3)).copy()
            screen[it : it + h, il : il + w] = frame
            return screen
        return frame
    raise ValueError("GIF contains no image block")


def _interlace_order(h: int) -> np.ndarray:
    """Display-row index for each stored row, in storage order."""
    return np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
