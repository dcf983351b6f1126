"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec).

The container has no Pillow/libjpeg, but JPEG is the dominant
web-corpus image format — a multimodal pipeline that quarantines every
JPEG is not credible. This module implements the baseline sequential
DCT process from the public standard:

- decoder: SOI/APPn/DQT/SOF0/DHT/DRI/SOS parsing, canonical Huffman
  entropy decode (with 0xFF00 stuffing and RSTn restart markers),
  dequantize → de-zigzag → 8×8 IDCT (one batched matmul per
  component), arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0).
  Returns the LUMA plane (Y is luma in JFIF YCbCr — no color
  transform needed for the perceptual-hash pipeline); chroma blocks
  are entropy-decoded (the bitstream demands it) but skip IDCT.
- encoder: grayscale or YCbCr 4:4:4 baseline writer used to build
  test fixtures and synthetic corpora. Tables are legal custom ones
  (flat-length canonical Huffman codes), NOT the Annex K defaults —
  any conformant decoder accepts them.

Decode is driver/UDF-side Python over small byte payloads (the same
Arrow-batched ``mapInPandas`` shape as the PNG/BMP paths in
``multimodal.py``); per-image cost is the Huffman loop, vectorized
everywhere numpy allows. Progressive (SOF2) and arithmetic coding are
out of scope → ``None`` (callers quarantine or stub).
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

#: zig-zag order: index i of this array is the zig-zag position of
#: natural (row-major) coefficient ZIGZAG[i]
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

#: standard luminance/chrominance quantization tables (T.81 Annex K.1,
#: quality ~50); scaled by the encoder's quality knob
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)


def _dct_matrix() -> np.ndarray:
    """8×8 type-II DCT basis C with orthonormal scaling: block_dct =
    C @ block @ C.T and block = C.T @ coeffs @ C."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2 / 8)
    c[0] /= np.sqrt(2)
    return c

_DCT = _dct_matrix()

#: decode refuses images above this pixel count (quarantine contract —
#: crafted SOF headers must not drive allocation; 25 MP covers any
#: plausible web-corpus photo)
MAX_PIXELS = 25_000_000


# ---------------------------------------------------------------------------
# Huffman machinery (canonical codes from (bits, values) — T.81 C.2)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=256)
def _decode_lut(bits: bytes, values: bytes) -> list[int]:
    """16-bit-peek Huffman decode table: LUT[next16bits] =
    (code_length << 8) | symbol, 0 = invalid prefix. Canonical
    assignment: codes of each length are consecutive, starting from
    (prev_start + count) << 1; prefix-freeness makes the extension
    ranges disjoint. Memoized on the raw DHT payload — an MJPEG
    stream repeats IDENTICAL tables in every frame, so a whole video
    (and every same-tabled image in a corpus batch) builds each
    table exactly once per worker process."""
    lut = [0] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        span = 1 << (16 - length)
        for _ in range(bits[length - 1]):
            entry = (length << 8) | values[k]
            start = code << (16 - length)
            lut[start:start + span] = [entry] * span
            code += 1
            k += 1
        code <<= 1
    return lut


def _split_entropy(data: bytes, pos: int) -> list[bytes]:
    """Destuff the entropy-coded scan (0xFF00 → 0xFF) in one forward
    pass (bulk ``bytes.find`` copies, not per-byte Python), split into
    per-restart-interval segments at RSTn markers; any other marker
    (EOI, next SOS…) terminates the scan."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = pos, len(data)
    while i < n:
        j = data.find(b"\xff", i)
        if j < 0:
            cur += data[i:]
            break
        cur += data[i:j]
        nxt = data[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:
            break
    segs.append(bytes(cur))
    return segs


class _EntropyBits:
    """MSB-first reads over pre-destuffed entropy segments. Reads past
    a segment end yield zero bits (T.81 F.2.2.5 padding semantics —
    the MCU loop bound terminates the scan)."""

    __slots__ = ("segs", "seg_idx", "buf", "bitpos")

    def __init__(self, segs: list[bytes]):
        self.segs = segs
        self.seg_idx = 0
        self.buf = segs[0] if segs else b""
        self.bitpos = 0

    def peek16(self) -> int:
        bp = self.bitpos
        w = self.buf[bp >> 3:(bp >> 3) + 4]
        if len(w) < 4:
            w += b"\x00\x00\x00"
        return (int.from_bytes(w[:4], "big") >> (16 - (bp & 7))) & 0xFFFF

    def get(self, n: int) -> int:
        """Read n ≤ 16 bits."""
        v = self.peek16() >> (16 - n)
        self.bitpos += n
        return v

    def restart(self) -> bool:
        """Advance past the next RSTn marker (= into the next
        pre-split segment); False when the stream has none left."""
        self.seg_idx += 1
        if self.seg_idx >= len(self.segs):
            return False
        self.buf = self.segs[self.seg_idx]
        self.bitpos = 0
        return True


def _extend(v: int, n: int) -> int:
    """EXTEND (T.81 F.2.2.1): map the n-bit magnitude to signed."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_baseline_jpeg(data: bytes) -> dict | None:
    """Decode a baseline JPEG → {"width", "height", "luma"} (float64
    H×W array, 0-255) or None when not a decodable baseline JPEG
    (truncated/corrupt payloads included — quarantine contract)."""
    try:
        return _decode_jpeg_inner(data)
    except (ValueError, IndexError, struct.error):
        return None


def _decode_jpeg_inner(data: bytes) -> dict | None:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS: nothing to decode
            return None
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(np.float64)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg[p:p + 128], dtype=">u2"
                    ).astype(np.float64)
                    p += 128
                nat = np.empty(64)
                nat[ZIGZAG] = tbl
                qt[tq] = nat.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 (baseline/ext sequential)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or h == 0 or w == 0:
                return None
            # quarantine crafted headers BEFORE any allocation: a
            # 65500x65500 SOF in a 300-byte payload would otherwise
            # allocate ~34 GB of coefficient blocks (and moderate fake
            # dims would spin the Huffman loop for minutes) — an
            # untrusted web corpus contains such payloads
            if h * w > MAX_PIXELS:
                return None
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                ch, cv = hv >> 4, hv & 0xF
                # T.81 bounds sampling factors to 1..4; 0 in a corrupt
                # header would divide-by-zero downstream
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    return None
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive/lossless/arithmetic: unsupported
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = seg[p + 1:p + 17]
                nv = sum(bits)
                values = seg[p + 17:p + 17 + nv]
                # raw payload only — the memoized peek-LUT is built at
                # scan time, once per DISTINCT table per process
                huff[(tc, th)] = (bits, values)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cs] = (tt >> 4, tt & 0xF)
            return _decode_scan(
                data, pos + seglen, frame, qt, huff, scan, restart_interval
            )
        pos += seglen
    return None


def _decode_scan(data, pos, frame, qt, huff, scan, restart_interval):
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _EntropyBits(_split_entropy(data, pos))
    # per-component collected coefficient blocks (luma only gets IDCT)
    luma = comps[0]
    n_lblocks = (mcux * luma["h"]) * (mcuy * luma["v"])
    lcoef = np.zeros((n_lblocks, 64), dtype=np.float64)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    try:
        # hoist the per-component LUTs out of the MCU loop (memoized
        # across frames: MJPEG repeats identical DHT every frame)
        tbls = [
            (
                _decode_lut(*huff[(0, scan[c["id"]][0])]),
                _decode_lut(*huff[(1, scan[c["id"]][1])]),
            )
            for c in comps
        ]
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and (
                    mcu_count % restart_interval == 0
                ):
                    if not br.restart():
                        raise ValueError("missing restart segment")
                    pred = {c["id"]: 0 for c in comps}
                mcu_count += 1
                for ci, c in enumerate(comps):
                    dc_lut, ac_lut = tbls[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = _decode_block(br, dc_lut, ac_lut, pred, c)
                            if ci == 0:
                                row = my * c["v"] + by
                                col = mx * c["h"] + bx
                                lcoef[row * mcux * c["h"] + col] = blk
    except (ValueError, KeyError):
        return None
    # dequantize + de-zigzag + batched IDCT for luma
    q = qt.get(luma["tq"])
    if q is None:
        return None
    nat = np.zeros_like(lcoef)
    nat[:, ZIGZAG] = lcoef
    blocks = nat.reshape(-1, 8, 8) * q[None, :, :]
    pix = np.einsum("ij,njk,kl->nil", _DCT.T, blocks, _DCT) + 128.0
    # stitch blocks into the luma plane at the component's resolution,
    # then upsample to frame resolution if subsampled (it isn't for Y
    # in practice: Y carries the max sampling factors)
    bw = mcux * luma["h"]
    bh = mcuy * luma["v"]
    plane = (
        pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )
    ch = h * luma["v"] // vmax
    cw = w * luma["h"] // hmax
    plane = plane[:ch, :cw]
    if luma["v"] != vmax or luma["h"] != hmax:
        plane = np.repeat(
            np.repeat(plane, vmax // luma["v"], axis=0),
            hmax // luma["h"], axis=1,
        )[:h, :w]
    return {
        "width": int(w),
        "height": int(h),
        "luma": np.clip(plane, 0.0, 255.0),
    }


def _decode_block(br, dc_lut, ac_lut, pred, comp) -> np.ndarray:
    blk = np.zeros(64, dtype=np.float64)
    e = dc_lut[br.peek16()]
    if not e:
        raise ValueError("invalid Huffman code")
    br.bitpos += e >> 8
    t = e & 0xFF
    if t:
        pred[comp["id"]] += _extend(br.get(t), t)
    blk[0] = pred[comp["id"]]
    k = 1
    while k < 64:
        e = ac_lut[br.peek16()]
        if not e:
            raise ValueError("invalid Huffman code")
        br.bitpos += e >> 8
        rs = e & 0xFF
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        blk[k] = _extend(br.get(s), s)
        k += 1
    return blk


# ---------------------------------------------------------------------------
# Encoder (test-fixture / synthetic-corpus writer)
# ---------------------------------------------------------------------------


def _flat_huffman(symbols: list[int], length: int) -> tuple[list[int], bytes]:
    """Legal canonical table giving every symbol the same code length
    (valid when count < 2**length; the all-ones code stays unused)."""
    if len(symbols) >= (1 << length):
        raise ValueError("too many symbols for flat code length")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, bytes(symbols)


def _encode_table(bits, values) -> dict[int, tuple[int, int]]:
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, magnitude bits) for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def encode_baseline_jpeg(
    pixels: "np.ndarray",
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Grayscale (H×W) or RGB (H×W×3, encoded as YCbCr) uint8 array →
    baseline JPEG bytes. ``subsampling``: '444' (one block per
    component per MCU) or '420' (2×2 luma blocks + box-averaged
    chroma — the dominant web shape, exercising interleaved-MCU
    decode). ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers every N MCUs (resetting DC predictors), the resync shape
    real encoders use for error resilience — it exercises the
    decoder's restart path. Deterministic; tables are flat-length
    canonical Huffman codes (legal custom tables)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    px = np.asarray(pixels)
    if px.ndim == 2:
        planes = [px.astype(np.float64)]
    elif px.ndim == 3 and px.shape[2] == 3:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        raise ValueError("pixels must be HxW (gray) or HxWx3 (RGB)")
    h, w = planes[0].shape
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if subsampling == "420" and len(planes) != 3:
        raise ValueError(
            "subsampling='420' requires RGB input (grayscale has no "
            "chroma to subsample — silently encoding 4:4:4 would skip "
            "the interleaved-MCU path the caller asked to exercise)"
        )
    if subsampling == "420" and len(planes) == 3:
        samp = [(2, 2), (1, 1), (1, 1)]
        for i in (1, 2):
            p = planes[i]
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            pp = np.empty((ph, pw))
            pp[:h, :w] = p
            pp[h:, :w] = p[-1:, :]
            pp[:, w:] = pp[:, w - 1:w]
            planes[i] = (
                pp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            )
    else:
        samp = [(1, 1)] * len(planes)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    qts = []
    for base in (QUANT_LUMA, QUANT_CHROMA)[: 2 if len(planes) > 1 else 1]:
        q = np.clip(np.floor((base * scale + 50) / 100), 1, 255)
        qts.append(q)

    dc_bits, dc_vals = _flat_huffman(list(range(12)), 4)
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_bits, ac_vals = _flat_huffman(ac_syms, 8)
    dc_enc = _encode_table(dc_bits, dc_vals)
    ac_enc = _encode_table(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"  # identifier
        + b"\x01\x01" + b"\x00"                 # version 1.1, no units
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # density 1:1, no thumb
    )
    for ti, q in enumerate(qts):
        zz = np.empty(64, dtype=np.uint8)
        zz[:] = q.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">HB", 67, ti) + zz.tobytes()
    nc = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i in range(nc):
        hv = (samp[i][0] << 4) | samp[i][1]
        out += struct.pack("BBB", i + 1, hv, 0 if i == 0 else 1)
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(vals), tc << 4
        ) + bytes(bits) + vals
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        out += struct.pack("BB", i + 1, 0x00)
    out += b"\x00\x3f\x00"

    bw_ = _BitWriter()
    pred = [0] * nc
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for ci, p in enumerate(planes):
        ph, pw = p.shape
        rows, cols = mcuy * samp[ci][1] * 8, mcux * samp[ci][0] * 8
        pp = np.empty((rows, cols))
        pp[:ph, :pw] = p
        pp[ph:, :pw] = p[ph - 1:ph, :pw]
        pp[:, pw:] = pp[:, pw - 1:pw]
        padded.append(pp - 128.0)

    def _emit_block(ci: int, row: int, col: int) -> None:
        q = qts[min(ci, len(qts) - 1)]
        blk = padded[ci][row * 8:row * 8 + 8, col * 8:col * 8 + 8]
        coef = _DCT @ blk @ _DCT.T
        quant = np.round(coef / q).astype(np.int64)
        zz = quant.reshape(-1)[ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        n, bits_ = _magnitude(diff)
        length, code = dc_enc[n]
        bw_.write(code, length)
        if n:
            bw_.write(bits_, n)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = ac_enc[0xF0]
                bw_.write(code, length)
                run -= 16
            n, bits_ = _magnitude(v)
            length, code = ac_enc[(run << 4) | n]
            bw_.write(code, length)
            bw_.write(bits_, n)
            run = 0
        if run:
            length, code = ac_enc[0x00]
            bw_.write(code, length)

    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                # close the entropy segment on a byte boundary, emit
                # RSTn (n cycles 0..7), reset DC predictors
                out += bw_.flush()
                bw_ = _BitWriter()
                rst = 0xD0 + ((mcu_n // restart_interval - 1) % 8)
                out += bytes((0xFF, rst))
                pred = [0] * nc
            mcu_n += 1
            for ci in range(nc):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        _emit_block(ci, my * vi + by, mx * hi + bx)
    out += bw_.flush()
    out += b"\xff\xd9"
    return bytes(out)
