"""Dependency-free baseline JPEG codec (pure Python + numpy).

Closes the MJPEG half of the compressed-video gap (the reference's
pipeline treats media as opaque payloads; decoding frames for feature
extraction is this engine's multimodal extension — see
``operators/multimodal.py``): MJPEG AVIs carry one baseline JPEG per
'00dc' chunk, so a baseline decoder makes ``frame_sample`` work on the
most common compressed AVI payload without ffmpeg/pyav (not in this
container). H.264+ stays behind the honest stub.

Scope (documented, asserted): BASELINE sequential DCT (SOF0), 8-bit,
1–4 components, arbitrary sampling factors (upsampled by pixel
repetition), restart intervals (DRI/RSTn). Progressive (SOF2),
arithmetic coding, and 12-bit inputs raise ``ValueError`` — callers
apply the corpus durability rule (skip the payload, never fail the
task).

The encoder exists to SYNTHESIZE deterministic test/bench frames and
to round-trip-test the decoder: grayscale or 4:4:4 color, uniform
quantization step ``q`` (q=1 keeps the DCT float error under one
count; solid-color frames with q dividing 8·(v−128) reconstruct
EXACTLY — what the MJPEG oracle relies on).

Layout follows ITU-T T.81; the Huffman tables are the Annex K
typicals.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K "typical" Huffman tables: (bits[1..16], values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8x8 DCT-II orthonormal basis: IDCT(block) = C.T @ F @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _a = np.sqrt(0.125) if _u == 0 else 0.5
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------

def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per T.81 C.2 canonical assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """(length, code) -> value lookup built from a DHT payload."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    byte unstuffing; stops at any marker (0xFF non-zero)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker reached: feed padding bits (decoder must not
                # need them past the last MCU)
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, dec: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            v = dec.lut.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code")

    def align_to_marker(self) -> None:
        """Drop partial byte and any stuffing; position at 0xFF."""
        self.n = 0
        self.acc = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and d[self.pos + 1] != 0x00
        ):
            self.pos += 1


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to a uint8 array: ``(h, w)`` for
    grayscale, ``(h, w, 3)`` RGB for color (BT.601 YCbCr). Raises
    ``ValueError`` for anything outside the documented scope."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", payload, i)
        body = payload[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 0xF
                p += 1
                if prec == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, p).astype(np.int32)
                    p += 128
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                (huff_dc if cls == 0 else huff_ac)[tid] = _HuffDecoder(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec = body[0]
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                comp["td"], comp["ta"] = tt >> 4, tt & 0xF
                scan.append(comp)
            return _decode_scan(
                payload, i + seglen, w, h, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        i += seglen
    raise ValueError("no SOS marker")


def _decode_scan(payload, pos, w, h, comps, qt, huff_dc, huff_ac, dri):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        cw, ch = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ch, cw), dtype=np.float64))
        c["pred"] = 0
    rd = _BitReader(payload, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                rd.align_to_marker()
                m = rd.data[rd.pos + 1]
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected RSTn marker")
                rd.pos += 2
                for c in comps:
                    c["pred"] = 0
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        t = rd.huff(huff_dc[c["td"]])
                        diff = _extend(rd.bits(t), t)
                        c["pred"] += diff
                        coef[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = rd.huff(huff_ac[c["ta"]])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[k] = _extend(rd.bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coef * qt[c["tq"]]
                        pix = _idct2(block.reshape(8, 8))
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # upsample to full resolution, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) == 3:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise ValueError(f"{len(full)}-component JPEG unsupported")


# ---------------------------------------------------------------------------
# encoder (test/bench synthesis + decoder round-trip proof)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.bits((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-padding


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_component_block(wr, coef_q, pred, dc_codes, ac_codes) -> int:
    zz = coef_q.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    wr.bits(code, ln)
    if t:
        wr.bits(_mag_bits(diff, t), t)
    run = 0
    last_nz = max(np.nonzero(zz[1:])[0] + 1) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            wr.bits(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        wr.bits(code, ln)
        wr.bits(_mag_bits(v, s), s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        wr.bits(code, ln)
    return int(zz[0])


def encode_baseline_jpeg(img: np.ndarray, q: int = 1) -> bytes:
    """Encode a uint8 grayscale ``(h, w)`` or RGB ``(h, w, 3)`` array as
    a baseline JPEG with a UNIFORM quantization table of step ``q``
    (q=1 ≈ visually lossless; color is 4:4:4 BT.601). Pure synthesis
    path — Annex K luminance Huffman tables for every component."""
    img = np.asarray(img)
    color = img.ndim == 3
    h, w = img.shape[:2]
    if color:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [img.astype(np.float64)]

    qtbl = np.full(64, int(q), dtype=np.int32)
    dc_codes = _huff_codes(*_DC_LUM)
    ac_codes = _huff_codes(*_AC_LUM)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        struct.pack(">BBB", c + 1, 0x11, 0) for c in range(ncomp)
    )
    dht = bytes([0x00]) + bytes(_DC_LUM[0]) + bytes(_DC_LUM[1]) \
        + bytes([0x10]) + bytes(_AC_LUM[0]) + bytes(_AC_LUM[1])
    sos = struct.pack(">B", ncomp) + b"".join(
        struct.pack(">BB", c + 1, 0x00) for c in range(ncomp)
    ) + b"\x00\x3f\x00"

    wr = _BitWriter()
    bw, bh = -(-w // 8), -(-h // 8)
    preds = [0] * ncomp
    for my in range(bh):
        for mx in range(bw):
            for ci, plane in enumerate(planes):
                blk = np.zeros((8, 8))
                ys, xs = my * 8, mx * 8
                sub = plane[ys : ys + 8, xs : xs + 8]
                blk[: sub.shape[0], : sub.shape[1]] = sub - 128.0
                # edge replicate padding keeps the block smooth
                if sub.shape[0] < 8:
                    blk[sub.shape[0] :, :] = blk[sub.shape[0] - 1, :]
                if sub.shape[1] < 8:
                    blk[:, sub.shape[1] :] = blk[:, sub.shape[1] - 1 : sub.shape[1]]
                coef = np.round(_dct2(blk) / q).astype(np.int32)
                zz = np.zeros(64, dtype=np.int32)
                zz[ZIGZAG] = coef.reshape(64)[ZIGZAG]  # identity keep
                preds[ci] = _encode_component_block(
                    wr, coef, preds[ci], dc_codes, ac_codes
                )
    wr.flush()
    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qtbl))
        + seg(0xC0, sof)
        + seg(0xC4, dht)
        + seg(0xDA, sos)
        + bytes(wr.out)
        + b"\xff\xd9"
    )
