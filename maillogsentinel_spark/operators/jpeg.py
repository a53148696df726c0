"""Baseline JPEG codec — pure numpy + stdlib, no image libraries.

Implements the sequential-baseline subset of the public JPEG spec
(ITU-T T.81 / ISO 10918-1): huffman-coded 8×8 DCT blocks, 8-bit
samples, grayscale or 4:4:4 YCbCr color, optional restart intervals.
The encoder and decoder share every table-construction helper (zigzag,
canonical huffman, DCT basis), so the bytes on the wire are real JPEG
structure — SOI/DQT/SOF0/DHT/SOS/EOI segments a third-party decoder
would accept — while the pair stays self-consistent by construction.

What is honestly NOT here (documented NotImplementedError gates, same
policy as the BMP/PNG/WAV codecs in operators/multimodal.py):
progressive (SOF2) and arithmetic-coded JPEGs, 12-bit precision, and
chroma subsampling other than 4:4:4.

Exactness contract used by the oracle query (multimodal_jpeg_decode):
with the all-ones quantization table, an image whose every 8×8 block is
a CONSTANT gray value decodes bit-exactly — a constant block has only a
DC coefficient (8·(c−128), an exact integer), quantization at step 1 is
lossless on integers, and the inverse DCT of a DC-only block is the
constant back. General images round-trip within a small tolerance
(lossy by design); tests pin both properties.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------


def zigzag_order() -> list[tuple[int, int]]:
    """The spec's zigzag scan: diagonals of i+j, alternating direction."""
    return sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else -p[0]),
    )


_ZIGZAG = zigzag_order()

# Typical huffman tables from the spec's Annex K (DC/AC luminance).
# Validity does not depend on matching Annex K digit-for-digit: the
# tables ride in DHT segments, so ANY canonical prefix code is a legal
# JPEG — but these are the published ones.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical huffman table given the
    per-length code counts (the DHT wire format)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the inverse of _canonical_codes."""
    return {
        (length, code): sym for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# Orthonormal 8-point DCT basis: fdct(B) = C @ B @ C.T matches the
# spec's FDCT (DC of a constant-c block is exactly 8c).
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else 0.5) * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# ---------------------------------------------------------------------------
# bit IO with 0xFF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None  # pending RST/EOI marker

    def _fill(self) -> None:
        if self.marker is not None:
            raise EOFError("hit marker while reading entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed FF
            else:
                self.marker = nxt
                self.pos += 1
                raise EOFError("marker in entropy stream")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_after_marker(self) -> int:
        """Consume the pending marker (RSTn), reset bit state."""
        # discard any partial bits already buffered
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet consumed from the byte stream — scan to it
            while True:
                b = self.data[self.pos]
                self.pos += 1
                if b == 0xFF and self.data[self.pos] != 0x00:
                    self.marker = self.data[self.pos]
                    self.pos += 1
                    break
        m, self.marker = self.marker, None
        return m


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy stream")


def _extend(v: int, ssss: int) -> int:
    """RECEIVE/EXTEND (spec F.2.2.1): map magnitude bits to signed."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    dc_pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    coef = np.round(_fdct(block.astype(np.float64) - 128.0) / quant).astype(np.int64)
    zz = [int(coef[i, j]) for i, j in _ZIGZAG]
    diff = zz[0] - dc_pred
    s = _category(diff)
    c, ln = dc_codes[s]
    w.write(c, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = ac_codes[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        s = _category(v)
        c, ln = ac_codes[(run << 4) | s]
        w.write(c, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        w.write(c, ln)
    return zz[0]


def encode_jpeg(
    pixels: np.ndarray,
    quant_value: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """(H, W) uint8 grayscale or (H, W, 3) uint8 RGB → baseline JPEG
    (4:4:4, flat quantization table of ``quant_value``, Annex-K typical
    huffman tables, optional DRI restart interval in MCUs)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    # pad to multiples of 8 with edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    quant = np.full((8, 8), quant_value, dtype=np.float64)
    qz = bytes(int(quant[i, j]) for i, j in _ZIGZAG)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, b"\x00" + qz)  # DQT, table 0, 8-bit
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += struct.pack(">BBB", cid, 0x11, 0)  # 1x1 sampling, quant 0
    out += _seg(0xC0, sof)  # SOF0 baseline
    out += _seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))  # DHT DC 0
    out += _seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))  # DHT AC 0
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])  # spectral selection (baseline fixed)
    out += _seg(0xDA, sos)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu = 0
    rst = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0] * ncomp
            for ci, plane in enumerate(planes):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                # _encode_block level-shifts internally (expects 0..255)
                preds[ci] = _encode_block(
                    bw, block, quant, preds[ci], dc_codes, ac_codes
                )
            mcu += 1
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, 3) uint8 RGB (grayscale replicated to 3
    channels — same convention as decode_png). Supports sequential
    baseline (SOF0), 8-bit, 4:4:4 or single-component, restart markers;
    raises NotImplementedError for progressive/arithmetic/12-bit/
    subsampled streams. Truncated payloads raise ValueError (the
    codecs' honest-gate contract), never a bare IndexError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    try:
        return _decode_jpeg_inner(payload)
    except (IndexError, struct.error, EOFError) as e:
        raise ValueError(f"truncated JPEG payload: {e}") from e


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    comps: list[tuple[int, int]] = []  # (component id, quant id)
    comp_tables: list[tuple[int, int]] = []  # (dc id, ac id) per comp
    h = w = 0
    restart_interval = 0
    scan_pos = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8))
                for k, (i, j) in enumerate(_ZIGZAG):
                    tbl[i, j] = body[o + 1 + k]
                quants[tq] = tbl
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                (dc_tables if tc == 0 else ac_tables)[th] = _decode_table(bits, vals)
                o += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (progressive/arithmetic/"
                "hierarchical) unsupported — baseline SOF0 only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                _cid, tt = body[1 + 2 * c : 3 + 2 * c]
                comp_tables.append((tt >> 4, tt & 0xF))
            scan_pos = pos
            break
        # APPn / COM / others: skipped via seglen
    if scan_pos is None or not comps:
        raise ValueError("JPEG missing SOS/SOF")

    ncomp = len(comps)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [np.zeros((ph, pw)) for _ in range(ncomp)]
    r = _BitReader(payload, scan_pos)
    preds = [0] * ncomp
    mcu = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                m = r.align_after_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RST marker, got {m:#x}")
                preds = [0] * ncomp
            for ci in range(ncomp):
                dc = dc_tables[comp_tables[ci][0]]
                ac = ac_tables[comp_tables[ci][1]]
                quant = quants[comps[ci][1]]
                zz = [0] * 64
                s = _huff_decode(r, dc)
                diff = _extend(r.read_bits(s), s) if s else 0
                preds[ci] += diff
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = _huff_decode(r, ac)
                    rrrr, ssss = rs >> 4, rs & 0xF
                    if ssss == 0:
                        if rrrr == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += rrrr
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    zz[k] = _extend(r.read_bits(ssss), ssss)
                    k += 1
                coef = np.zeros((8, 8))
                for kk, (i, j) in enumerate(_ZIGZAG):
                    coef[i, j] = zz[kk]
                block = _idct(coef * quant) + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            mcu += 1

    planes = [p[:h, :w] for p in planes]
    if ncomp == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    rch = y + 1.402 * (cr - 128.0)
    gch = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    rgb = np.stack([rch, gch, bch], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
