"""Arithmetic-coded JPEG entropy decoding (ITU T.81 §D, §F.2.4).

The QM-coder state machine below is ITU T.81 Table D.3 (113 adaptive
states + the non-adapting "fixed" 0.5 state used for AC signs), checked
against the copy in the system libjpeg data section.  The decoder
follows the spec's DECODE / MPS_EXCHANGE / LPS_EXCHANGE / RENORMD /
BYTEIN flowcharts with the deployed convention for markers inside the
entropy segment (feed zero bytes from the marker on; 0xFF00 is a
stuffed 0xFF data byte).

Statistics binding per §F.2.4.1-3: DC contexts conditioned on the
previous diff's classification against the DAC L/U thresholds; AC
contexts indexed 3*(k-1) with the magnitude-category areas split at Kx.
Verified end to end in tests/test_jpeg_arith.py: the same image encoded
by libjpeg with Huffman and with arithmetic coding must decode to
byte-identical pixels through this pipeline (entropy coding is
lossless, so the quantized coefficients must agree exactly), plus a
golden pixel comparison against libjpeg's own decode.
"""
from __future__ import annotations

from .codecs import CodecError

# (Qe, NextMPS, (Switch<<7)|NextLPS) — T.81 Table D.3; index 113 is
# the fixed (non-adapting) state.  Folding Switch into the next-LPS
# byte lets the MPS exchange be a single XOR against the (MPS<<7)|index
# state byte.
ARITH_TAB = (
    (0x5A1D, 1, 129),
    (0x2586, 2, 14),
    (0x1114, 3, 16),
    (0x080B, 4, 18),
    (0x03D8, 5, 20),
    (0x01DA, 6, 23),
    (0x00E5, 7, 25),
    (0x006F, 8, 28),
    (0x0036, 9, 30),
    (0x001A, 10, 33),
    (0x000D, 11, 35),
    (0x0006, 12, 9),
    (0x0003, 13, 10),
    (0x0001, 13, 12),
    (0x5A7F, 15, 143),
    (0x3F25, 16, 36),
    (0x2CF2, 17, 38),
    (0x207C, 18, 39),
    (0x17B9, 19, 40),
    (0x1182, 20, 42),
    (0x0CEF, 21, 43),
    (0x09A1, 22, 45),
    (0x072F, 23, 46),
    (0x055C, 24, 48),
    (0x0406, 25, 49),
    (0x0303, 26, 51),
    (0x0240, 27, 52),
    (0x01B1, 28, 54),
    (0x0144, 29, 56),
    (0x00F5, 30, 57),
    (0x00B7, 31, 59),
    (0x008A, 32, 60),
    (0x0068, 33, 62),
    (0x004E, 34, 63),
    (0x003B, 35, 32),
    (0x002C, 9, 33),
    (0x5AE1, 37, 165),
    (0x484C, 38, 64),
    (0x3A0D, 39, 65),
    (0x2EF1, 40, 67),
    (0x261F, 41, 68),
    (0x1F33, 42, 69),
    (0x19A8, 43, 70),
    (0x1518, 44, 72),
    (0x1177, 45, 73),
    (0x0E74, 46, 74),
    (0x0BFB, 47, 75),
    (0x09F8, 48, 77),
    (0x0861, 49, 78),
    (0x0706, 50, 79),
    (0x05CD, 51, 48),
    (0x04DE, 52, 50),
    (0x040F, 53, 50),
    (0x0363, 54, 51),
    (0x02D4, 55, 52),
    (0x025C, 56, 53),
    (0x01F8, 57, 54),
    (0x01A4, 58, 55),
    (0x0160, 59, 56),
    (0x0125, 60, 57),
    (0x00F6, 61, 58),
    (0x00CB, 62, 59),
    (0x00AB, 63, 61),
    (0x008F, 32, 61),
    (0x5B12, 65, 193),
    (0x4D04, 66, 80),
    (0x412C, 67, 81),
    (0x37D8, 68, 82),
    (0x2FE8, 69, 83),
    (0x293C, 70, 84),
    (0x2379, 71, 86),
    (0x1EDF, 72, 87),
    (0x1AA9, 73, 87),
    (0x174E, 74, 72),
    (0x1424, 75, 72),
    (0x119C, 76, 74),
    (0x0F6B, 77, 74),
    (0x0D51, 78, 75),
    (0x0BB6, 79, 77),
    (0x0A40, 48, 77),
    (0x5832, 81, 208),
    (0x4D1C, 82, 88),
    (0x438E, 83, 89),
    (0x3BDD, 84, 90),
    (0x34EE, 85, 91),
    (0x2EAE, 86, 92),
    (0x299A, 87, 93),
    (0x2516, 71, 86),
    (0x5570, 89, 216),
    (0x4CA9, 90, 95),
    (0x44D9, 91, 96),
    (0x3E22, 92, 97),
    (0x3824, 93, 99),
    (0x32B4, 94, 99),
    (0x2E17, 86, 93),
    (0x56A8, 96, 223),
    (0x4F46, 97, 101),
    (0x47E5, 98, 102),
    (0x41CF, 99, 103),
    (0x3C3D, 100, 104),
    (0x375E, 93, 99),
    (0x5231, 102, 105),
    (0x4C0F, 103, 106),
    (0x4639, 104, 107),
    (0x415E, 99, 103),
    (0x5627, 106, 233),
    (0x50E7, 107, 108),
    (0x4B85, 103, 109),
    (0x5597, 109, 110),
    (0x504F, 107, 111),
    (0x5A10, 111, 238),
    (0x5522, 109, 112),
    (0x59EB, 111, 240),
    (0x5A1D, 113, 113),
)


class ArithDecoder:
    """T.81 §D.2 arithmetic decoding procedure over one entropy
    segment, in the deployed register formulation: C accumulates code
    bytes, CT counts bits until the next byte is due, A is the interval
    (renormalized lazily at the START of each decision, which also
    performs the two-byte seeding from the initial CT = -16).  State
    bytes store (MPS << 7) | state_index; the Switch_MPS bit travels in
    the table's next-LPS byte so the conditional exchange is a single
    XOR."""

    __slots__ = ("data", "pos", "end", "c", "a", "ct", "marker_seen")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.end = len(data)
        self.marker_seen = False
        self.c = 0
        self.a = 0
        self.ct = -16

    def _byte(self) -> int:
        if self.marker_seen or self.pos >= self.end:
            return 0
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            while self.pos < self.end and self.data[self.pos] == 0xFF:
                self.pos += 1
            if self.pos < self.end and self.data[self.pos] == 0:
                self.pos += 1
                return 0xFF
            self.pos -= 1  # leave the marker for the caller
            self.marker_seen = True
            return 0
        return b

    def decode(self, area: bytearray, idx: int) -> int:
        # renormalization & data feeding (§D.2.6), including the
        # initial two-byte seed
        a = self.a
        c = self.c
        ct = self.ct
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                c = ((c << 8) | self._byte()) & 0xFFFFFFFFFFFF
                ct += 8
                if ct < 0:
                    ct += 1
                    if ct == 0:
                        a = 0x8000
            a <<= 1
        sv = area[idx]
        qe, nm, nl = ARITH_TAB[sv & 0x7F]
        a -= qe
        temp = a << ct
        if c >= temp:
            c -= temp
            if a < qe:
                a = qe
                area[idx] = (sv & 0x80) ^ nm   # estimate after MPS
            else:
                a = qe
                area[idx] = (sv & 0x80) ^ nl   # estimate after LPS
                sv ^= 0x80                     # exchange
        elif a < 0x8000:
            if a < qe:
                area[idx] = (sv & 0x80) ^ nl
                sv ^= 0x80
            else:
                area[idx] = (sv & 0x80) ^ nm
        self.a = a
        self.c = c
        self.ct = ct
        return sv >> 7


FIXED_BIN = bytearray([113])


def decode_dc_arith(dec: ArithDecoder, stats: bytearray, ctx_state: list,
                    ci: int, cond_l: int, cond_u: int) -> int:
    """One DC difference per §F.2.4.1 (decoder mirror of the encoder's
    Figures F.4-F.9)."""
    base = ctx_state[ci]
    if dec.decode(stats, base) == 0:
        ctx_state[ci] = 0
        return 0
    sign = dec.decode(stats, base + 1)
    st = base + 2 + sign
    m = dec.decode(stats, st)
    if m:
        st = 20
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise CodecError("jpeg: arith DC magnitude overflow")
            st += 1
    # next-block conditioning category from this diff's magnitude
    if m < ((1 << cond_l) >> 1):
        ctx_state[ci] = 0
    elif m > ((1 << cond_u) >> 1):
        ctx_state[ci] = 12 + sign * 4
    else:
        ctx_state[ci] = 4 + sign * 4
    v = m
    st += 14
    mm = m
    while mm := mm >> 1:
        if dec.decode(stats, st):
            v |= mm
    v += 1
    return -v if sign else v


def decode_ac_arith(dec: ArithDecoder, stats: bytearray, k: int,
                    kx: int, se: int):
    """One AC coefficient (or EOB) per §F.2.4.3.  Returns (k, value)
    with value None signalling EOB."""
    st = 3 * (k - 1)
    if dec.decode(stats, st):
        return k, None
    while dec.decode(stats, st + 1) == 0:
        st += 3
        k += 1
        if k > se:
            raise CodecError("jpeg: arith AC index overflow")
    sign = dec.decode(FIXED_BIN, 0)
    st += 2
    m = dec.decode(stats, st)
    if m:
        if dec.decode(stats, st):
            m = 2
            st = 189 if k <= kx else 217
            while dec.decode(stats, st):
                m <<= 1
                if m == 0x8000:
                    raise CodecError("jpeg: arith AC magnitude overflow")
                st += 1
    v = m
    st += 14
    mm = m
    while mm := mm >> 1:
        if dec.decode(stats, st):
            v |= mm
    v += 1
    return k, (-v if sign else v)


def decode_dc_refine_arith(dec: ArithDecoder, coef, al: int) -> None:
    """DC successive-approximation refinement: one fixed-probability
    bit per block (§G.2 arithmetic variant)."""
    if dec.decode(FIXED_BIN, 0):
        coef[0] |= 1 << al


def decode_ac_refine_arith(dec: ArithDecoder, stats: bytearray, coef,
                           zigzag, ss: int, se: int, al: int) -> None:
    """AC successive-approximation refinement for one block: correction
    bits for previously-nonzero coefficients, newly-significant bits at
    the current level, EOB decision gated past the previous stage's
    end-of-block index."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex > 0 and coef[int(zigzag[kex])] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(stats, st):
                break
        while True:
            z = int(zigzag[k])
            if coef[z]:
                if dec.decode(stats, st + 2):
                    coef[z] += m1 if coef[z] < 0 else p1
                break
            if dec.decode(stats, st + 1):
                coef[z] = m1 if dec.decode(FIXED_BIN, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise CodecError("jpeg: arith AC refine overflow")
        k += 1
