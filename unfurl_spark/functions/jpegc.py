"""JPEG codec (ITU-T T.81) in stdlib + numpy: baseline sequential DCT
AND progressive (SOF2).

Decoder: marker parse → Huffman entropy decode (with byte stuffing and
restart markers) → dequantize → vectorized numpy IDCT → chroma
upsample → YCbCr→RGB.  Handles SOF0/SOF1 and SOF2 (spectral selection
+ successive approximation per T.81 G.1.2, incl. EOB runs and AC
refinement correction bits), 4:4:4 / 4:2:2 / 4:2:0 sampling, DRI
restarts, and multi-SOS NON-INTERLEAVED sequential files (one scan per
component subset, T.81 A.2.2 — scans accumulate into per-component
planes and assemble once every component is coded).  Arithmetic coding
decodes too — sequential (SOF9, incl. non-interleaved multi-scan) and
progressive (SOF10) via the T.81 QM-coder in ``jpegarith`` — and so
does the LOSSLESS process (SOF3, Annex H: spatial DPCM, predictors
1-7, point transform, modulo-65536).  The remaining boundaries are the
hierarchical modes (SOF5-7/13-15), arithmetic lossless (SOF11), and
lossless precision above 8 bits (12/16-bit DNG raws exceed the uint8
pixel contract).

Encoders (test-fixture use): baseline with Annex K tables, and a
progressive encoder with the conventional multi-scan script.  Encoder
and decoder are independent walks of the spec, so round-trip tests
exercise both directions — and progressive-vs-baseline encodes of the
same image must decode to IDENTICAL pixels (same coefficients,
different entropy organization), which pins each against the other.

The reference never decodes JPEG essence — its exif plugin stops at
metadata (packages/unfurl-exif/src/index.ts:16-47).  This module exists
for the training-data side: pixel features and thumbnails at scale.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import CodecError, CodecUnavailable, _check_dims, total

# zigzag order: index i holds the raster position of the i-th scanned coeff
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# T.81 Annex K.1 — luminance / chrominance quantization tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# T.81 Annex K.3 — canonical Huffman table specs: (bits[1..16], values)
HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II basis: IDCT is  C.T @ X @ C
_N = np.arange(8)
_DCT_C = np.cos((2 * _N[:, None] + 1) * _N[None, :] * np.pi / 16) / 2
_DCT_C[:, 0] /= np.sqrt(2)


def _canonical_codes(bits: list[int], values: list[int]
                     ) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol, per T.81 C.2 canonical assignment."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 de-stuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d, p = self.data, self.pos
        if p >= len(d):
            raise CodecError("jpeg: truncated entropy data")
        byte = d[p]
        if byte == 0xFF:
            # T.81 B.1.1.2: any run of 0xFF fill bytes may precede the
            # classifying byte — skip them, else legal FF FF sequences
            # inside the scan would prematurely pad with 1-bits
            while p + 1 < len(d) and d[p + 1] == 0xFF:
                p += 1
            self.pos = p
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:
                raise CodecError("jpeg: unconsumed restart marker")
            else:  # EOI/next segment: pad with 1-bits per spec
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | byte
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

    def align_restart(self) -> None:
        """Discard partial byte and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d, p = self.data, self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF
                                      and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        if p + 1 >= len(d):
            raise CodecError("jpeg: missing restart marker")
        self.pos = p + 2

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise CodecError("jpeg: bad Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.12 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


@total
def decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xFF\xD8":
        raise CodecError("jpeg: bad signature")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) → code table
    frame = None  # (w, h, comps)
    restart_interval = 0
    progressive = False
    arithmetic = False
    arith_dc: dict[int, tuple] = {}   # table id → (L, U)
    arith_ac: dict[int, int] = {}     # table id → Kx
    prog_state: dict[int, dict] = {}  # comp id → {"coefs": ndarray}
    seq_covered: set[int] = set()     # comp ids coded by sequential scans
    lossless = 0                      # SOF3: sample precision, else 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise CodecError("jpeg: marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 15
                i += 1
                if prec:
                    qtables[tid] = np.frombuffer(
                        body[i:i + 128], ">u2").astype(np.int32)
                    i += 128
                else:
                    qtables[tid] = np.frombuffer(
                        body[i:i + 64], np.uint8).astype(np.int32)
                    i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tclass, tid = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                nval = sum(bits)
                values = list(body[i + 17:i + 17 + nval])
                htables[(tclass, tid)] = _canonical_codes(bits, values)
                i += 17 + nval
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 seq, SOF2 progressive
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if nc not in (1, 3):
                # 4-component Adobe CMYK/YCCK (and exotic 2-component)
                # frames would silently decode the first 3 planes as
                # YCbCr — garbage pixels flagged ok.  Out of scope.
                raise CodecUnavailable(f"jpeg: {nc}-component frame")
            comps = []
            for ci in range(nc):
                cid, sampling, qid = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": sampling >> 4,
                              "v": sampling & 15, "q": qid})
            frame = (w, h, comps)
            if marker == 0xC2:
                progressive = True
                _check_dims(w, h, "jpeg")
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                for c in comps:
                    prog_state[c["id"]] = {
                        "coefs": np.zeros(
                            (mcuy * c["v"], mcux * c["h"], 64), np.int32)}
        elif marker == 0xC9:  # SOF9: arithmetic-coded sequential
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if nc not in (1, 3):
                raise CodecUnavailable(f"jpeg: {nc}-component frame")
            comps = []
            for ci in range(nc):
                cid, sampling, qid = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": sampling >> 4,
                              "v": sampling & 15, "q": qid})
            frame = (w, h, comps)
            arithmetic = True
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            i = 0
            while i + 1 < len(body):
                tclass, tid = body[i] >> 4, body[i] & 15
                if tclass == 0:
                    arith_dc[tid] = (body[i + 1] & 15, body[i + 1] >> 4)
                else:
                    arith_ac[tid] = body[i + 1]
                i += 2
        elif marker == 0xCA:  # SOF10: arithmetic-coded progressive
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if nc not in (1, 3):
                raise CodecUnavailable(f"jpeg: {nc}-component frame")
            comps = []
            for ci in range(nc):
                cid, sampling, qid = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": sampling >> 4,
                              "v": sampling & 15, "q": qid})
            frame = (w, h, comps)
            arithmetic = True
            progressive = True
            _check_dims(w, h, "jpeg")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                prog_state[c["id"]] = {
                    "coefs": np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), np.int32)}
        elif marker == 0xC3:  # SOF3: Huffman lossless (T.81 Annex H)
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if nc not in (1, 3):
                raise CodecUnavailable(f"jpeg: {nc}-component frame")
            if not 2 <= prec <= 8:
                # 12/16-bit lossless (DNG raws) exceeds the uint8 pixel
                # contract of this pipeline
                raise CodecUnavailable(
                    f"jpeg: {prec}-bit lossless precision")
            comps = []
            for ci in range(nc):
                cid, sampling, qid = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": sampling >> 4,
                              "v": sampling & 15, "q": qid})
            frame = (w, h, comps)
            lossless = prec
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise CodecUnavailable(f"jpeg: SOF{marker - 0xC0} unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise CodecError("jpeg: SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cid, tids = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((cid, tids >> 4, tids & 15))
            if lossless:
                ss, _se, ahal = body[1 + 2 * ns:4 + 2 * ns]
                _decode_scan_lossless(
                    data, pos + 2 + seg_len, frame, scan, htables,
                    restart_interval, ss, ahal & 15, lossless)
                seq_covered.update(cid for cid, _d, _a in scan)
                if len(seq_covered) == len(frame[2]):
                    return _assemble_lossless(frame, ahal & 15, lossless)
                pos = _next_marker(data, pos + 2 + seg_len)
                continue
            if not progressive:
                # sequential scans accumulate into per-component planes
                # (T.81 allows multi-SOS non-interleaved baseline/SOF9
                # files: each scan covers a component subset); assemble
                # once every frame component has been coded
                if arithmetic:
                    _decode_scan_arith(
                        data, pos + 2 + seg_len, frame, scan, qtables,
                        arith_dc, arith_ac, restart_interval)
                else:
                    _decode_scan(data, pos + 2 + seg_len, frame, scan,
                                 qtables, htables, restart_interval)
                seq_covered.update(cid for cid, _d, _a in scan)
                if len(seq_covered) == len(frame[2]):
                    return _assemble(frame)
                pos = _next_marker(data, pos + 2 + seg_len)
                continue
            if arithmetic:
                ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
                pos = _decode_prog_scan_arith(
                    data, pos + 2 + seg_len, frame, scan, ss, se,
                    ahal >> 4, ahal & 15, arith_dc, arith_ac,
                    restart_interval, prog_state)
                continue
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            pos = _decode_prog_scan(
                data, pos + 2 + seg_len, frame, scan, ss, se,
                ahal >> 4, ahal & 15, htables, restart_interval,
                prog_state)
            continue
        pos += 2 + seg_len
    if progressive and frame is not None:
        return _reconstruct_progressive(frame, prog_state, qtables)
    raise CodecError("jpeg: no scan data")


def _scan_geometry(frame):
    """(hmax, vmax, mcux, mcuy) for the frame's interleaved MCU grid."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _prep_scan_comp(c, frame):
    """Allocate the component's frame-aligned coefficient/pixel plane
    once (it persists across the scans of a multi-scan sequential file)
    and reset the DC predictor (per-scan state, T.81 E.2.4)."""
    _, _, mcux, mcuy = _scan_geometry(frame)
    if "plane" not in c:
        c["pw"] = mcux * c["h"] * 8
        c["ph"] = mcuy * c["v"] * 8
        c["plane"] = np.zeros((c["ph"], c["pw"]), np.float32)
    c["pred"] = 0


def _noninterleaved_blocks(c, frame):
    """Block walk of one component's own sampling grid (T.81 A.2.2:
    a single-component scan is NOT MCU-interleaved; its 'MCU' is one
    block and the walk covers ceil(comp_w/8) x ceil(comp_h/8))."""
    w, h, _ = frame
    hmax, vmax, _, _ = _scan_geometry(frame)
    bw = (w * c["h"] + 8 * hmax - 1) // (8 * hmax)
    bh = (h * c["v"] + 8 * vmax - 1) // (8 * vmax)
    for by in range(bh):
        for bx in range(bw):
            yield by * 8, bx * 8


def _assemble(frame) -> np.ndarray:
    """Upsample + color-convert the accumulated component planes."""
    w, h, comps = frame
    hmax, vmax, _, _ = _scan_geometry(frame)
    planes = []
    for c in comps:
        p = c["plane"] + 128.0
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


def _next_marker(data, pos) -> int:
    """Skip one scan's entropy-coded data: first non-RST marker at or
    after ``pos``.  Valid for both entropy coders — Huffman stuffs 0x00
    after a data 0xFF; the QM coder bit-stuffs so the byte after a data
    0xFF is < 0x80 — so an 0xFF followed by 0xC0..0xFE (excluding RSTn)
    can only be a real marker."""
    i, n = pos, len(data)
    while i + 1 < n:
        if data[i] == 0xFF:
            b = data[i + 1]
            if 0xC0 <= b < 0xFF and not (0xD0 <= b <= 0xD7):
                return i
        i += 1
    return n


def _decode_scan_lossless(data, pos, frame, scan, htables,
                          restart_interval, psv, pt, prec) -> None:
    """One lossless-process scan (T.81 Annex H): spatial DPCM with the
    scan-selected predictor, Huffman-coded difference magnitudes (the
    DC table code, plus the SSSS=16 → 32768 special), modulo-65536
    reconstruction.  Interleaved MCU = one sample per component;
    sampling factors other than 1×1 are out of scope.  Fills integer
    sample planes; ``_assemble_lossless`` stacks them (no color
    transform — the lossless process is colorspace-agnostic)."""
    w, h, comps = frame
    _check_dims(w, h, "jpeg")
    by_id = {c["id"]: c for c in comps}
    scomps = []
    for cid, dc_id, _ac in scan:
        c = by_id[cid]
        if c["h"] != 1 or c["v"] != 1:
            raise CodecUnavailable("jpeg: lossless subsampling")
        c["dc_t"] = htables[(0, dc_id)]
        if "plane" not in c:
            c["plane"] = np.zeros((h, w), np.int32)
        scomps.append(c)

    reader = _BitReader(data, pos)
    default = 1 << (prec - pt - 1)
    mcu = 0
    reset = False   # sample after RSTn predicts from the default

    def diff_of(c) -> int:
        t = reader.decode_huff(c["dc_t"])
        if t == 16:             # T.81 H.1.2.3: no appended bits
            return 32768
        return _extend(reader.read_bits(t), t) if t else 0

    for y in range(h):
        for x in range(w):
            if (restart_interval and mcu
                    and mcu % restart_interval == 0):
                reader.align_restart()
                reset = True
            for c in scomps:
                p = c["plane"]
                if reset or (y == 0 and x == 0):
                    px = default
                elif y == 0:
                    px = int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    ra, rb, rc = (int(p[y, x - 1]), int(p[y - 1, x]),
                                  int(p[y - 1, x - 1]))
                    if psv == 1:
                        px = ra
                    elif psv == 2:
                        px = rb
                    elif psv == 3:
                        px = rc
                    elif psv == 4:
                        px = ra + rb - rc
                    elif psv == 5:
                        px = ra + ((rb - rc) >> 1)
                    elif psv == 6:
                        px = rb + ((ra - rc) >> 1)
                    elif psv == 7:
                        px = (ra + rb) >> 1
                    else:
                        raise CodecError(f"jpeg: lossless predictor {psv}")
                p[y, x] = (px + diff_of(c)) & 0xFFFF
            reset = False
            mcu += 1


def _assemble_lossless(frame, pt, prec) -> np.ndarray:
    """Stack the DPCM sample planes: output = Rx << Pt, masked to the
    declared precision.  No upsampling (1×1 enforced) and no YCbCr
    transform — T.81's lossless process codes input samples directly."""
    w, h, comps = frame
    planes = [((c["plane"] << pt) & ((1 << prec) - 1)).astype(np.uint8)
              for c in comps]
    if len(planes) == 1:
        return planes[0][:, :, None]
    return np.dstack(planes)


def _decode_scan(data, pos, frame, scan, qtables, htables,
                 restart_interval) -> None:
    """One sequential Huffman scan → the scan components' planes.
    Handles both the interleaved (multi-component MCU) and the
    non-interleaved (single-component block) walks; the dispatcher
    assembles pixels once every frame component has been covered."""
    w, h, comps = frame
    _check_dims(w, h, "jpeg")
    by_id = {c["id"]: c for c in comps}
    scomps = []
    for cid, dc_id, ac_id in scan:
        c = by_id[cid]
        c["dc_t"] = htables[(0, dc_id)]
        c["ac_t"] = htables[(1, ac_id)]
        c["qt"] = qtables[c["q"]]
        _prep_scan_comp(c, frame)
        scomps.append(c)

    reader = _BitReader(data, pos)
    ct = _DCT_C.astype(np.float32)

    def decode_block(c, y0, x0):
        coeffs = np.zeros(64, np.int32)
        t = reader.decode_huff(c["dc_t"])
        diff = _extend(reader.read_bits(t), t)
        c["pred"] += diff
        coeffs[0] = c["pred"]
        k = 1
        while k < 64:
            rs = reader.decode_huff(c["ac_t"])
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise CodecError("jpeg: AC index overflow")
            coeffs[k] = _extend(reader.read_bits(s), s)
            k += 1
        block = np.zeros(64, np.float32)
        block[ZIGZAG] = coeffs * c["qt"][np.arange(64)]
        # IDCT: x = M.T X M with M the orthonormal DCT basis;
        # _DCT_C == M.T
        px = ct @ block.reshape(8, 8) @ ct.T
        c["plane"][y0:y0 + 8, x0:x0 + 8] = px

    mcu_count = 0
    if len(scomps) == 1:
        c = scomps[0]
        for y0, x0 in _noninterleaved_blocks(c, frame):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                reader.align_restart()
                c["pred"] = 0
            decode_block(c, y0, x0)
            mcu_count += 1
        return
    _, _, mcux, mcuy = _scan_geometry(frame)
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                reader.align_restart()
                for c in scomps:
                    c["pred"] = 0
            for c in scomps:
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        decode_block(c, (my * c["v"] + bv) * 8,
                                     (mx * c["h"] + bh) * 8)
            mcu_count += 1


def _decode_scan_arith(data, pos, frame, scan, qtables, arith_dc,
                       arith_ac, restart_interval) -> None:
    """One sequential arithmetic-coded scan (SOF9): same walks as
    _decode_scan with the QM entropy decoder from jpegarith (T.81
    §F.2.4) in place of Huffman — interleaved MCU grid for
    multi-component scans, per-component block grid for
    single-component scans (non-interleaved multi-SOS files).  Fills
    the scan components' planes; the dispatcher assembles."""
    from .jpegarith import ArithDecoder, decode_ac_arith, decode_dc_arith

    w, h, comps = frame
    _check_dims(w, h, "jpeg")
    by_id = {c["id"]: c for c in comps}
    scomps = []
    for ci, (cid, dc_id, ac_id) in enumerate(scan):
        c = by_id[cid]
        c["dc_l"], c["dc_u"] = arith_dc.get(dc_id, (0, 1))
        c["kx"] = arith_ac.get(ac_id, 5)
        c["dc_tid"], c["ac_tid"] = dc_id, ac_id
        c["qt"] = qtables[c["q"]]
        _prep_scan_comp(c, frame)
        c["idx"] = ci
        scomps.append(c)

    def fresh_stats():
        # statistics areas are per-scan state (E.2.4 / F.2.4), keyed by
        # the tables the SCAN components name — a subset scan must not
        # touch tables it does not use
        dc = {tid: bytearray(64) for tid in {c["dc_tid"] for c in scomps}}
        ac = {tid: bytearray(256) for tid in {c["ac_tid"] for c in scomps}}
        return dc, ac

    dec = ArithDecoder(data, pos)
    dc_stats, ac_stats = fresh_stats()
    dc_ctx = [0] * len(scomps)
    ct = _DCT_C.astype(np.float32)

    def decode_block(c, y0, x0):
        coeffs = np.zeros(64, np.int32)
        diff = decode_dc_arith(
            dec, dc_stats[c["dc_tid"]], dc_ctx,
            c["idx"], c["dc_l"], c["dc_u"])
        c["pred"] += diff
        coeffs[0] = c["pred"]
        k = 1
        stats = ac_stats[c["ac_tid"]]
        while k <= 63:
            k, v = decode_ac_arith(dec, stats, k, c["kx"], 63)
            if v is None:
                break
            coeffs[k] = v
            k += 1
        block = np.zeros(64, np.float32)
        block[ZIGZAG] = coeffs * c["qt"][np.arange(64)]
        px = ct @ block.reshape(8, 8) @ ct.T
        c["plane"][y0:y0 + 8, x0:x0 + 8] = px

    def restart():
        nonlocal dec, dc_stats, ac_stats, dc_ctx
        # skip to just past the RSTn marker, reinit everything
        p2 = dec.pos
        while p2 + 1 < len(data) and not (
                data[p2] == 0xFF
                and 0xD0 <= data[p2 + 1] <= 0xD7):
            p2 += 1
        dec = ArithDecoder(data, p2 + 2)
        dc_stats, ac_stats = fresh_stats()
        dc_ctx = [0] * len(scomps)
        for c in scomps:
            c["pred"] = 0

    mcu_count = 0
    if len(scomps) == 1:
        c = scomps[0]
        for y0, x0 in _noninterleaved_blocks(c, frame):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                restart()
            decode_block(c, y0, x0)
            mcu_count += 1
        return
    _, _, mcux, mcuy = _scan_geometry(frame)
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                restart()
            for c in scomps:
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        decode_block(c, (my * c["v"] + bv) * 8,
                                     (mx * c["h"] + bh) * 8)
            mcu_count += 1


# ---------------------------------------------------------------------------
# progressive (SOF2) scan decoding — T.81 G.1.2: spectral selection bands
# plus successive approximation.  Coefficients accumulate across scans in
# natural (raster) order; the final IDCT runs once over all blocks.


def _ac_first_block(reader, ac_t, coef, ss, se, al, eobrun):
    """One block of an AC first scan (Ah=0).  Returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(ac_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r)+bits blocks incl. this one
                return (1 << r) + (reader.read_bits(r) if r else 0) - 1
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise CodecError("jpeg: AC index overflow")
        coef[int(ZIGZAG[k])] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac_t, coef, ss, se, al, eobrun):
    """One block of an AC refinement scan (Ah>0), per T.81 G.1.2.3:
    correction bits ride along for every already-nonzero coefficient the
    scan passes over.  Returns the new EOB run."""
    bit = 1 << al

    def correct(z):
        if reader.read_bit() and not (abs(coef[z]) & bit):
            coef[z] += bit if coef[z] > 0 else -bit

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(ac_t)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + (reader.read_bits(r) if r else 0)
                    break
                val = 0  # ZRL: skip 16 zero-history coeffs
            elif s == 1:
                val = bit if reader.read_bit() else -bit
            else:
                raise CodecError("jpeg: bad AC refine magnitude")
            while k <= se:
                z = int(ZIGZAG[k])
                if coef[z] != 0:
                    correct(z)
                    k += 1
                    continue
                if r == 0:
                    if val:
                        coef[z] = val
                    k += 1
                    break
                r -= 1
                k += 1
    if eobrun > 0:
        # EOB region covers the rest of this block's band
        while k <= se:
            z = int(ZIGZAG[k])
            if coef[z] != 0:
                correct(z)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(data, pos, frame, scan, ss, se, ah, al,
                      htables, restart_interval, state) -> int:
    """Decode one progressive SOS; returns the file offset of the next
    marker.  DC scans (ss=0) may interleave components in MCU order; AC
    scans are single-component in block raster order (T.81 G.1)."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    reader = _BitReader(data, pos)
    eobrun = 0
    preds = {cid: 0 for cid, _, _ in scan}

    def dc_block(coef, cid, dc_t):
        if ah == 0:  # DC first (with point transform)
            t = reader.decode_huff(dc_t)
            preds[cid] += _extend(reader.read_bits(t), t)
            coef[0] = preds[cid] << al
        else:  # DC refinement: one bit per block
            coef[0] |= reader.read_bit() << al

    n_units = 0

    def maybe_restart():
        nonlocal eobrun
        if (restart_interval and n_units
                and n_units % restart_interval == 0):
            reader.align_restart()
            eobrun = 0
            for cid in preds:
                preds[cid] = 0

    if ss == 0 and len(scan) > 1:
        # interleaved DC scan: MCU order over the full grid
        tabs = {}
        for cid, dc_id, _ac in scan:
            tabs[cid] = htables[(0, dc_id)] if ah == 0 else None
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for cid, _dc, _ac in scan:
                    c = by_id[cid]
                    coefs = state[cid]["coefs"]
                    for bv in range(c["v"]):
                        for bh in range(c["h"]):
                            dc_block(coefs[my * c["v"] + bv,
                                           mx * c["h"] + bh],
                                     cid, tabs[cid])
                n_units += 1
    else:
        # single-component scan: the component's own block raster
        cid, dc_id, ac_id = scan[0]
        c = by_id[cid]
        coefs = state[cid]["coefs"]
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        nbx = (cw + 7) // 8
        nby = (ch + 7) // 8
        dc_t = htables.get((0, dc_id)) if ss == 0 and ah == 0 else None
        ac_t = htables.get((1, ac_id)) if ss > 0 else None
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart()
                coef = coefs[by, bx]
                if ss == 0:
                    dc_block(coef, cid, dc_t)
                elif ah == 0:
                    eobrun = _ac_first_block(
                        reader, ac_t, coef, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(
                        reader, ac_t, coef, ss, se, al, eobrun)
                n_units += 1

    # skip to the next marker (entropy padding / stray RSTs in between)
    p = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF):
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(data)


def _decode_prog_scan_arith(data, pos, frame, scan, ss, se, ah, al,
                            arith_dc, arith_ac, restart_interval,
                            state) -> int:
    """One arithmetic-coded progressive SOS (SOF10).  Mirrors
    _decode_prog_scan's grid walk with the §G.2 arithmetic block
    primitives; statistics and the QM decoder re-initialize per scan
    (and per restart)."""
    from .jpegarith import (
        ArithDecoder,
        decode_ac_arith,
        decode_ac_refine_arith,
        decode_dc_arith,
        decode_dc_refine_arith,
    )

    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}

    def fresh():
        return (ArithDecoder(data, pos_holder[0]),
                {tid: bytearray(64) for tid in dc_tids},
                {tid: bytearray(256) for tid in ac_tids},
                [0] * len(scan), {cid: 0 for cid, _, _ in scan})

    pos_holder = [pos]
    dc_tids = {dc_id for _, dc_id, _ in scan}
    ac_tids = {ac_id for _, _, ac_id in scan}
    dec, dc_stats, ac_stats, dc_ctx, last_dc = fresh()
    n_units = 0

    def maybe_restart():
        nonlocal dec, dc_stats, ac_stats, dc_ctx, last_dc
        if (restart_interval and n_units
                and n_units % restart_interval == 0):
            p2 = dec.pos
            while p2 + 1 < len(data) and not (
                    data[p2] == 0xFF and 0xD0 <= data[p2 + 1] <= 0xD7):
                p2 += 1
            pos_holder[0] = p2 + 2
            dec, dc_stats, ac_stats, dc_ctx, last_dc = fresh()

    if ss == 0 and len(scan) > 1:
        # interleaved DC scan in MCU order
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for si, (cid, dc_id, _ac) in enumerate(scan):
                    c = by_id[cid]
                    cl, cu = arith_dc.get(dc_id, (0, 1))
                    coefs = state[cid]["coefs"]
                    for bv in range(c["v"]):
                        for bh in range(c["h"]):
                            coef = coefs[my * c["v"] + bv,
                                         mx * c["h"] + bh]
                            if ah == 0:
                                diff = decode_dc_arith(
                                    dec, dc_stats[dc_id], dc_ctx, si,
                                    cl, cu)
                                last_dc[cid] += diff
                                coef[0] = last_dc[cid] << al
                            else:
                                decode_dc_refine_arith(dec, coef, al)
                n_units += 1
    else:
        cid, dc_id, ac_id = scan[0]
        c = by_id[cid]
        coefs = state[cid]["coefs"]
        cw = (w * c["h"] + hmax - 1) // hmax
        chh = (h * c["v"] + vmax - 1) // vmax
        nbx = (cw + 7) // 8
        nby = (chh + 7) // 8
        cl, cu = arith_dc.get(dc_id, (0, 1))
        kx = arith_ac.get(ac_id, 5)
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart()
                coef = coefs[by, bx]
                if ss == 0:
                    if ah == 0:
                        diff = decode_dc_arith(
                            dec, dc_stats[dc_id], dc_ctx, 0, cl, cu)
                        last_dc[cid] += diff
                        coef[0] = last_dc[cid] << al
                    else:
                        decode_dc_refine_arith(dec, coef, al)
                elif ah == 0:
                    stats = ac_stats[ac_id]
                    k = ss
                    while k <= se:
                        k, v = decode_ac_arith(dec, stats, k, kx, se)
                        if v is None:
                            break
                        coef[int(ZIGZAG[k])] = v << al
                        k += 1
                else:
                    decode_ac_refine_arith(
                        dec, ac_stats[ac_id], coef, ZIGZAG, ss, se, al)
                n_units += 1

    p = dec.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF):
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(data)


def _reconstruct_progressive(frame, state, qtables) -> np.ndarray:
    """Dequantize + IDCT every accumulated block, assemble planes, and
    run the shared upsample/color tail."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    ct = _DCT_C.astype(np.float32)
    planes = []
    for c in comps:
        if c["q"] not in qtables:
            raise CodecError("jpeg: missing quantization table")
        qt_nat = np.empty(64, np.float32)
        qt_nat[ZIGZAG] = qtables[c["q"]].astype(np.float32)
        coefs = state[c["id"]]["coefs"].astype(np.float32) * qt_nat
        nby, nbx = coefs.shape[:2]
        blocks = coefs.reshape(nby, nbx, 8, 8)
        # IDCT all blocks at once: x = C X C.T per block
        px = np.einsum("ij,abjk,lk->abil", ct, blocks, ct,
                       optimize=True)
        plane = px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                              hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (4:4:4, Annex K tables, quality via linear scale)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _encode_codes(bits, values) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) — inverse of the decoder's table."""
    inv = {}
    for (length, code), sym in _canonical_codes(bits, values).items():
        inv[sym] = (code, length)
    return inv


def _magnitude(v: int) -> tuple[int, int]:
    """→ (category t, t-bit encoding of v) per T.81 F.1.2.1."""
    t = int(v != 0 and int(abs(v)).bit_length())
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _prepare_planes(img: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: color convert + quality-scaled quant
    tables + optional 4:2:0 chroma downsample + MCU-padded planes.
    Returns (h, w, nc, factors, qts, padded, mcux, mcuy)."""
    img = np.atleast_3d(img.astype(np.uint8))
    h, w, c = img.shape
    if c == 4:
        img = img[:, :, :3]
        c = 3
    scale = (5000 // quality if quality < 50 else 200 - 2 * quality) or 1
    qts = []
    for base in ((QT_LUMA,) if c == 1 else (QT_LUMA, QT_CHROMA)):
        qts.append(np.clip((base * scale + 50) // 100, 1, 255))

    if c == 1:
        planes = [img[:, :, 0].astype(np.float32) - 128.0]
    else:
        rf = img.astype(np.float32)
        r, g, b = rf[:, :, 0], rf[:, :, 1], rf[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    nc = len(planes)
    sub = subsample and nc == 3
    # per-component (h_factor, v_factor)
    factors = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nc
    if sub:
        # box-filter chroma 2× (pad odd dims by edge replication first)
        def down2(p: np.ndarray) -> np.ndarray:
            ph = p if p.shape[0] % 2 == 0 else np.vstack([p, p[-1:]])
            ph = ph if ph.shape[1] % 2 == 0 else np.hstack([ph, ph[:, -1:]])
            return (ph[0::2, 0::2] + ph[1::2, 0::2]
                    + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0
        planes = [planes[0], down2(planes[1]), down2(planes[2])]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for ci, p in enumerate(planes):
        hi, vi = factors[ci]
        pw, ph = mcux * hi * 8, mcuy * vi * 8
        pp = np.zeros((ph, pw), np.float32)
        sh, sw = p.shape
        pp[:sh, :sw] = p
        pp[sh:, :sw] = p[-1:, :]
        pp[:, sw:] = pp[:, sw - 1:sw]
        padded.append(pp)
    return h, w, nc, factors, qts, padded, mcux, mcuy


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline encoder.  ``subsample=True`` emits 4:2:0 (luma 2×2 per
    MCU, chroma box-filtered 2×); ``restart_interval`` emits DRI + RSTn
    markers every N MCUs — both exist chiefly so the decoder's
    upsample/restart paths have independent fixtures."""
    h, w, nc, factors, qts, padded, mcux, mcuy = _prepare_planes(
        img, quality, subsample)

    out = bytearray(b"\xFF\xD8")
    for tid, qt in enumerate(qts):
        out += (b"\xFF\xDB" + struct.pack(">HB", 67, tid)
                + qt[ZIGZAG].astype(np.uint8).tobytes())
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        hi, vi = factors[ci]
        out += bytes([ci + 1, (hi << 4) | vi,
                      min(ci, 1) if nc > 1 else 0])
    specs = [HT_DC_LUMA, HT_AC_LUMA] + (
        [HT_DC_CHROMA, HT_AC_CHROMA] if nc > 1 else [])
    classes = [(0, 0), (1, 0)] + ([(0, 1), (1, 1)] if nc > 1 else [])
    for (tclass, tid), (bits, values) in zip(classes, specs):
        out += b"\xFF\xC4" + struct.pack(
            ">HB", 19 + len(values), (tclass << 4) | tid)
        out += bytes(bits) + bytes(values)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        tid = min(ci, 1) if nc > 1 else 0
        out += bytes([ci + 1, (tid << 4) | tid])
    out += b"\x00\x3F\x00"

    dc_tabs = [_encode_codes(*HT_DC_LUMA)]
    ac_tabs = [_encode_codes(*HT_AC_LUMA)]
    if nc > 1:
        dc_tabs.append(_encode_codes(*HT_DC_CHROMA))
        ac_tabs.append(_encode_codes(*HT_AC_CHROMA))

    ct = _DCT_C.astype(np.float32)
    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    mcu_count = 0

    def encode_block(ti: int, block: np.ndarray, ci: int) -> None:
        coeffs = ct.T @ block @ ct  # FDCT: X = M x M.T
        q = np.round(coeffs.reshape(64)[ZIGZAG]
                     / qts[ti][ZIGZAG]).astype(np.int64)
        diff = int(q[0]) - preds[ci]
        preds[ci] = int(q[0])
        t, enc = _magnitude(diff)
        code, ln = dc_tabs[ti][t]
        bw.write(code, ln)
        if t:
            bw.write(enc, t)
        run = 0
        for k in range(1, 64):
            v = int(q[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                zcode, zln = ac_tabs[ti][0xF0]
                bw.write(zcode, zln)
                run -= 16
            t, enc = _magnitude(v)
            code, ln = ac_tabs[ti][(run << 4) | t]
            bw.write(code, ln)
            bw.write(enc, t)
            run = 0
        if run:
            code, ln = ac_tabs[ti][0x00]
            bw.write(code, ln)

    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * nc
            for ci in range(nc):
                hi, vi = factors[ci]
                ti = min(ci, 1) if nc > 1 else 0
                for bv in range(vi):
                    for bh_ in range(hi):
                        y0 = (my * vi + bv) * 8
                        x0 = (mx * hi + bh_) * 8
                        encode_block(
                            ti, padded[ci][y0:y0 + 8, x0:x0 + 8], ci)
            mcu_count += 1
    bw.flush()
    return bytes(out) + bytes(bw.out) + b"\xFF\xD9"


# ---------------------------------------------------------------------------
# progressive (SOF2) encoder — fixture generator for the progressive
# decoder paths: spectral selection bands, successive approximation
# (DC + AC first/refine scans), EOB runs with correction bits.  Scan
# script mirrors the conventional default (DC Al=1 → luma low band →
# chroma → luma refinements → DC refine → AC refines to Al=0).

# flat Huffman tables covering every (run, size) symbol incl. the EOBn
# codes (r<<4) the Annex K tables lack: all 176 symbols at 9 bits
_HT_PROG_AC_SYMS = [(r << 4) | s for r in range(16) for s in range(11)]
_HT_PROG_AC = ([0] * 8 + [len(_HT_PROG_AC_SYMS)] + [0] * 7,
               _HT_PROG_AC_SYMS)
_HT_PROG_DC = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))


def _pt_ac(v: int, al: int) -> int:
    """T.81 G.1.2.2 AC point transform: magnitude shift, sign kept."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _enc_ac_first_scan(bw, blocks, ss, se, al, ac_tab):
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        while eobrun > 0:
            r = min(14, eobrun.bit_length() - 1)
            take = min(eobrun, (1 << r) + (1 << r) - 1)
            code, ln = ac_tab[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(take - (1 << r), r)
            eobrun -= take

    for q in blocks:
        vals = [_pt_ac(int(q[k]), al) for k in range(ss, se + 1)]
        if not any(vals):
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for v in vals:
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                run -= 16
            t, enc = _magnitude(v)
            code, ln = ac_tab[(run << 4) | t]
            bw.write(code, ln)
            bw.write(enc, t)
            run = 0
        if run:
            eobrun += 1  # trailing zeros fold into an EOB run
    flush_eob()


def _enc_ac_refine_scan(bw, blocks, ss, se, al, ac_tab):
    """AC refinement (Ah = Al+1 → Al), the inverse of
    ``_ac_refine_block``: newly-nonzero coefficients get (run,1)+sign
    codes, already-nonzero ones ride as interleaved correction bits,
    EOB runs buffer their correction bits until flushed."""
    eobrun = 0
    be: list[int] = []  # correction bits buffered across the EOB region

    def flush_eob():
        nonlocal eobrun, be
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_tab[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0
        for b in be:
            bw.write(b, 1)
        be = []

    for q in blocks:
        band = [int(q[k]) for k in range(ss, se + 1)]
        mags = [abs(v) >> al for v in band]
        # events since the last emitted code: zeros and correction bits
        events: list = []
        emitted_any = False
        for v, m in zip(band, mags):
            if m == 0:
                events.append("z")
            elif m > 1:  # history coefficient → correction bit
                events.append(m & 1)
            else:  # newly nonzero at this precision
                if not emitted_any:
                    flush_eob()
                    emitted_any = True
                while sum(1 for e in events if e == "z") > 15:
                    code, ln = ac_tab[0xF0]
                    bw.write(code, ln)
                    z = 0
                    while z < 16:
                        ev = events.pop(0)
                        if ev == "z":
                            z += 1
                        else:
                            bw.write(ev, 1)
                r = sum(1 for e in events if e == "z")
                code, ln = ac_tab[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if v >= 0 else 0, 1)
                for ev in events:
                    if ev != "z":
                        bw.write(ev, 1)
                events = []
        trailing_bits = [e for e in events if e != "z"]
        if events:
            eobrun += 1
            be.extend(trailing_bits)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85,
                            subsample: bool = False) -> bytes:
    h, w, nc, factors, qts, padded, mcux, mcuy = _prepare_planes(
        img, quality, subsample)
    ct = _DCT_C.astype(np.float32)

    # quantized zigzag coefficients for every padded block per component
    qz = []
    for ci, pp in enumerate(padded):
        ti = min(ci, 1) if nc > 1 else 0
        nby, nbx = pp.shape[0] // 8, pp.shape[1] // 8
        blocks = (pp.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3))
        coeffs = np.einsum("ji,abjk,kl->abil", ct, blocks, ct,
                           optimize=True)  # FDCT: X = M x M.T
        q = np.round(coeffs.reshape(nby, nbx, 64)[:, :, ZIGZAG]
                     / qts[ti][ZIGZAG]).astype(np.int64)
        qz.append(q)

    out = bytearray(b"\xFF\xD8")
    for tid, qt in enumerate(qts):
        out += (b"\xFF\xDB" + struct.pack(">HB", 67, tid)
                + qt[ZIGZAG].astype(np.uint8).tobytes())
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        hi, vi = factors[ci]
        out += bytes([ci + 1, (hi << 4) | vi,
                      min(ci, 1) if nc > 1 else 0])
    for (tclass, tid), (bits, values) in (((0, 0), _HT_PROG_DC),
                                          ((1, 0), _HT_PROG_AC)):
        out += b"\xFF\xC4" + struct.pack(
            ">HB", 19 + len(values), (tclass << 4) | tid)
        out += bytes(bits) + bytes(values)
    dc_tab = _encode_codes(*_HT_PROG_DC)
    ac_tab = _encode_codes(*_HT_PROG_AC)

    def comp_grid(ci):
        """Non-interleaved block grid (excludes interleave-only dummies)."""
        hi, vi = factors[ci]
        hmax = max(f[0] for f in factors)
        vmax = max(f[1] for f in factors)
        nbx = ((w * hi + hmax - 1) // hmax + 7) // 8
        nby = ((h * vi + vmax - 1) // vmax + 7) // 8
        return nbx, nby

    def sos(comp_ids, ss, se, ah, al, payload: bytes) -> None:
        ns = len(comp_ids)
        out.extend(b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ns, ns))
        for ci in comp_ids:
            out.extend(bytes([ci + 1, 0x00]))  # DC/AC table 0
        out.extend(bytes([ss, se, (ah << 4) | al]))
        out.extend(payload)

    def dc_scan(al, first):
        bw = _BitWriter()
        preds = [0] * nc
        if nc > 1:  # interleaved over the full MCU grid
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in range(nc):
                        hi, vi = factors[ci]
                        for bv in range(vi):
                            for bh in range(hi):
                                v = int(qz[ci][my * vi + bv,
                                               mx * hi + bh, 0]) >> al
                                if first:
                                    t, enc = _magnitude(v - preds[ci])
                                    preds[ci] = v
                                    code, ln = dc_tab[t]
                                    bw.write(code, ln)
                                    if t:
                                        bw.write(enc, t)
                                else:
                                    bw.write(v & 1, 1)
        else:
            nbx, nby = comp_grid(0)
            for by in range(nby):
                for bx in range(nbx):
                    v = int(qz[0][by, bx, 0]) >> al
                    if first:
                        t, enc = _magnitude(v - preds[0])
                        preds[0] = v
                        code, ln = dc_tab[t]
                        bw.write(code, ln)
                        if t:
                            bw.write(enc, t)
                    else:
                        bw.write(v & 1, 1)
        bw.flush()
        sos(list(range(nc)), 0, 0, 0 if first else al + 1, al,
            bytes(bw.out))

    def ac_scan(ci, ss, se, ah, al):
        nbx, nby = comp_grid(ci)
        blocks = [qz[ci][by, bx] for by in range(nby)
                  for bx in range(nbx)]
        bw = _BitWriter()
        if ah == 0:
            _enc_ac_first_scan(bw, blocks, ss, se, al, ac_tab)
        else:
            _enc_ac_refine_scan(bw, blocks, ss, se, al, ac_tab)
        bw.flush()
        sos([ci], ss, se, ah, al, bytes(bw.out))

    # scan script (conventional default shape)
    dc_scan(1, first=True)
    if nc == 3:
        ac_scan(0, 1, 5, 0, 2)
        ac_scan(2, 1, 63, 0, 1)
        ac_scan(1, 1, 63, 0, 1)
        ac_scan(0, 6, 63, 0, 2)
        ac_scan(0, 1, 63, 2, 1)
        dc_scan(0, first=False)
        ac_scan(2, 1, 63, 1, 0)
        ac_scan(1, 1, 63, 1, 0)
        ac_scan(0, 1, 63, 1, 0)
    else:
        ac_scan(0, 1, 5, 0, 2)
        ac_scan(0, 6, 63, 0, 2)
        ac_scan(0, 1, 63, 2, 1)
        dc_scan(0, first=False)
        ac_scan(0, 1, 63, 1, 0)
    out += b"\xFF\xD9"
    return bytes(out)


def encode_jpeg_lossless(img: np.ndarray, psv: int = 1, pt: int = 0,
                         restart_interval: int = 0) -> bytes:
    """Fixture writer: T.81 Annex H lossless process (SOF3), 8-bit,
    1×1 sampling, single interleaved scan, predictor ``psv`` (1-7),
    point transform ``pt``.  Independent walk of the spec so the
    round-trip tests pin the decoder (no system lossless codec exists
    to golden against — libjpeg-turbo < 3.0)."""
    img = np.atleast_3d(np.asarray(img, np.uint8))
    h, w, nc = img.shape
    if nc == 4:
        img = img[:, :, :3]
        nc = 3
    if not 1 <= psv <= 7:
        raise ValueError(f"psv {psv}")
    samples = (img.astype(np.int32) >> pt)
    prec = 8

    out = bytearray(b"\xFF\xD8")
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xC3" + struct.pack(">HBHHB", 8 + 3 * nc, prec, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, 0])
    bits, values = HT_DC_LUMA
    out += (b"\xFF\xC4" + struct.pack(">HB", 19 + len(values), 0)
            + bytes(bits) + bytes(values))
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00])
    out += bytes([psv, 0, pt])

    tab = _encode_codes(*HT_DC_LUMA)
    bw = _BitWriter()
    default = 1 << (prec - pt - 1)
    mcu = 0
    reset = False
    rst = 0
    for y in range(h):
        for x in range(w):
            if (restart_interval and mcu
                    and mcu % restart_interval == 0):
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                reset = True
            for ci in range(nc):
                p = samples[:, :, ci]
                if reset or (y == 0 and x == 0):
                    px = default
                elif y == 0:
                    px = int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    ra, rb, rc = (int(p[y, x - 1]), int(p[y - 1, x]),
                                  int(p[y - 1, x - 1]))
                    px = {1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                          5: ra + ((rb - rc) >> 1),
                          6: rb + ((ra - rc) >> 1),
                          7: (ra + rb) >> 1}[psv]
                diff = (int(p[y, x]) - px) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000     # signed mod-65536 difference
                t, enc = _magnitude(diff)
                code, length = tab[t]
                bw.write(code, length)
                if t:
                    bw.write(enc, t)
            reset = False
            mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)
