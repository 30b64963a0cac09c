"""WebP VP8L (lossless) codec in stdlib + numpy.

Decoder implements the public WebP Lossless Bitstream Specification
(RFC 9649): LSB-first bitstream, canonical prefix codes (simple and
code-length-coded), color cache, LZ77 backward references with the
120-entry 2D distance map, meta-prefix (entropy) images, and all four
transforms — PREDICTOR (14 modes), COLOR, SUBTRACT_GREEN,
COLOR_INDEXING (palette with sub-byte packing) — applied in reverse.

Encoder (test-fixture use) emits legal VP8L streams: literal pixels
under real per-channel Huffman codes, optional SUBTRACT_GREEN /
COLOR_INDEXING transforms, optional color cache, and an RLE LZ77 mode
— enough to round-trip arbitrary images and exercise every decoder
path.  The PREDICTOR/COLOR inverse transforms are pinned by tests that
forward-apply the spec's definitions independently.

VP8 (lossy) essence decodes for real too, via the from-scratch
RFC 6386 intra-frame decoder in ``vp8.py`` (bit-exact against libwebp's
own reconstruction in tests/test_vp8.py).

The reference reads only WebP container headers
(packages/unfurl-exif/src/index.ts:16-47 via ExifReader); pixel decode
exists for the training-data side (features/thumbnails at scale).
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

from .codecs import CodecError, CodecUnavailable, _check_dims

# RFC 9649: code-length-code read order
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)

# RFC 9649: 2D offsets for distance codes 1..120
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (2, 7), (-2, 7), (7, 2), (-7, 2), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5),
    (-7, 5), (8, 4), (3, 8), (-3, 8), (8, 5), (4, 8), (-4, 8), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 6), (5, 8), (-5, 8), (8, 7), (6, 8),
    (-6, 8), (7, 7), (-7, 7), (8, 8))


class _Bits:
    """LSB-first bit reader (VP8L convention, unlike JPEG's MSB-first)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        byte_end = (end + 7) >> 3
        if byte_end > len(self.data):
            raise CodecError("vp8l: truncated bitstream")
        chunk = int.from_bytes(self.data[self.pos >> 3:byte_end], "little")
        v = (chunk >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos = end
        return v


def _canonical(lengths: list[int]):
    """Code lengths → decode table {(len, code): symbol} (DEFLATE-style
    canonical assignment), or ("single", sym) for one-symbol codes."""
    nz = [(length, sym) for sym, length in enumerate(lengths) if length]
    if not nz:
        raise CodecError("vp8l: empty prefix code")
    if len(nz) == 1:
        return ("single", nz[0][1])
    max_len = max(length for length, _ in nz)
    bl_count = [0] * (max_len + 1)
    for length, _ in nz:
        bl_count[length] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for length in range(1, max_len + 1):
        code = (code + bl_count[length - 1]) << 1
        next_code[length] = code
    table = {}
    for sym, length in enumerate(lengths):
        if length:
            table[(length, next_code[length])] = sym
            next_code[length] += 1
    return table


def _decode_sym(br: _Bits, table) -> int:
    if isinstance(table, tuple):  # single-symbol code: zero bits
        return table[1]
    code = 0
    for length in range(1, 16):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise CodecError("vp8l: bad prefix code")


def _read_prefix_code(br: _Bits, alphabet_size: int):
    """One prefix code: simple (1-2 symbols) or code-length-coded."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        s0 = br.read(8) if br.read(1) else br.read(1)
        if num_symbols == 1:
            return ("single", s0)
        return {(1, 0): s0, (1, 1): br.read(8)}
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_table = _canonical(cl_lengths)
    if br.read(1):  # explicit max symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev, sym = 8, 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = _decode_sym(br, cl_table)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                if sym < alphabet_size:
                    lengths[sym] = prev
                    sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    return _canonical(lengths)


def _prefix_value(br: _Bits, slot: int) -> int:
    """LZ77 length/distance prefix decoding (RFC 9649 §4.2.2)."""
    if slot < 4:
        return slot + 1
    extra_bits = (slot - 2) >> 1
    offset = (2 + (slot & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image(br: _Bits, w: int, h: int, level0: bool) -> np.ndarray:
    """Entropy-coded ARGB image → uint32 array (h, w); at level 0 the
    transforms are read (and later inverted by the caller via the
    returned transform list in ``decode_vp8l``)."""
    transforms = []
    if level0:
        while br.read(1):
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise CodecError("vp8l: duplicate transform")
            if ttype == 0 or ttype == 1:  # PREDICTOR / COLOR
                bits = 2 + br.read(3)
                sub = _decode_image(br, _sub_size(w, bits),
                                    _sub_size(h, bits), False)
                transforms.append((ttype, bits, sub))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append((2, None, None))
            else:  # COLOR_INDEXING
                pal_size = br.read(8) + 1
                pal32 = _decode_image(br, pal_size, 1, False)[0]
                # palette entries are componentwise delta-coded; stack
                # into explicit [a, r, g, b] columns (endian-safe)
                comp = np.stack([(pal32 >> 24) & 0xFF,
                                 (pal32 >> 16) & 0xFF,
                                 (pal32 >> 8) & 0xFF,
                                 pal32 & 0xFF], axis=-1)
                pal = np.cumsum(comp.astype(np.uint32),
                                axis=0).astype(np.uint8)
                transforms.append((3, pal_size, pal))
                # sub-byte index packing narrows the coded width
                if pal_size <= 2:
                    w = _sub_size(w, 3)
                elif pal_size <= 4:
                    w = _sub_size(w, 2)
                elif pal_size <= 16:
                    w = _sub_size(w, 1)

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise CodecError("vp8l: bad color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    num_groups = 1
    if level0 and br.read(1):  # meta-prefix image
        meta_bits = 2 + br.read(3)
        meta = _decode_image(br, _sub_size(w, meta_bits),
                             _sub_size(h, meta_bits), False)
        # group index rides in (red << 8) | green
        meta = (((meta >> 16) & 0xFF) << 8) | ((meta >> 8) & 0xFF)
        num_groups = int(meta.max()) + 1

    green_size = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append((_read_prefix_code(br, green_size),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 40)))

    n = w * h
    out = np.zeros(n, np.uint32)
    pos = 0
    g = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        green_t, red_t, blue_t, alpha_t, dist_t = g
        s = _decode_sym(br, green_t)
        if s < 256:  # literal
            red = _decode_sym(br, red_t)
            blue = _decode_sym(br, blue_t)
            alpha = _decode_sym(br, alpha_t)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = px
        elif s < 280:  # LZ77 backward reference
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, _decode_sym(br, dist_t))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(1, dy * w + dx)
            if dist > pos or pos + length > n:
                raise CodecError("vp8l: bad back-reference")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache_size:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
        else:  # color cache
            out[pos] = cache[s - 280]
            pos += 1
    img = out.reshape(h, w)
    if level0:
        img = _apply_inverse_transforms(img, transforms, )
    return img


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.uint16) + b.astype(np.uint16)) >> 1


def _predict(mode: int, ch_l, ch_t, ch_tl, ch_tr) -> np.ndarray:
    """One predictor mode over per-channel uint8[4] neighbor vectors."""
    if mode == 0:
        return np.array([255, 0, 0, 0], np.uint8)  # ARGB opaque black
    if mode == 1:
        return ch_l
    if mode == 2:
        return ch_t
    if mode == 3:
        return ch_tr
    if mode == 4:
        return ch_tl
    if mode == 5:
        return _avg2(_avg2(ch_l, ch_tr), ch_t).astype(np.uint8)
    if mode == 6:
        return _avg2(ch_l, ch_tl).astype(np.uint8)
    if mode == 7:
        return _avg2(ch_l, ch_t).astype(np.uint8)
    if mode == 8:
        return _avg2(ch_tl, ch_t).astype(np.uint8)
    if mode == 9:
        return _avg2(ch_t, ch_tr).astype(np.uint8)
    if mode == 10:
        return _avg2(_avg2(ch_l, ch_tl),
                     _avg2(ch_t, ch_tr)).astype(np.uint8)
    if mode == 11:  # Select
        p_l = int(np.abs(ch_t.astype(int) - ch_tl.astype(int)).sum())
        p_t = int(np.abs(ch_l.astype(int) - ch_tl.astype(int)).sum())
        return ch_t if p_t <= p_l else ch_l
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(ch_l.astype(int) + ch_t.astype(int)
                       - ch_tl.astype(int), 0, 255).astype(np.uint8)
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(ch_l, ch_t).astype(int)
        half = ave + np.trunc((ave - ch_tl.astype(int)) / 2).astype(int)
        return np.clip(half, 0, 255).astype(np.uint8)
    raise CodecError(f"vp8l: bad predictor mode {mode}")


def _apply_inverse_transforms(img: np.ndarray, transforms) -> np.ndarray:
    h, w = img.shape
    for ttype, arg, sub in reversed(transforms):
        if ttype == 3:  # COLOR_INDEXING
            pal_size, pal = arg, sub
            idx_bits = (3 if pal_size <= 2 else 2 if pal_size <= 4
                        else 1 if pal_size <= 16 else 0)
            idx = (img >> 8) & 0xFF  # indices in the green channel
            if idx_bits:
                per = 1 << idx_bits    # pixels packed per green byte
                bits = 8 >> idx_bits   # bits per index
                cols = []
                for i in range(per):
                    cols.append((idx >> (i * bits)) & ((1 << bits) - 1))
                idx = np.stack(cols, axis=-1).reshape(h, -1)
            idx = np.minimum(idx, pal_size - 1).astype(np.int64)
            argb = (pal[:, 0].astype(np.uint32) << 24 \
                    | pal[:, 1].astype(np.uint32) << 16
                    | pal[:, 2].astype(np.uint32) << 8
                    | pal[:, 3].astype(np.uint32))
            img = argb[idx]
            h, w = img.shape
        elif ttype == 2:  # SUBTRACT_GREEN inverse
            green = (img >> 8) & 0xFF
            red = (((img >> 16) & 0xFF) + green) & 0xFF
            blue = ((img & 0xFF) + green) & 0xFF
            img = (img & 0xFF00FF00) | (red << 16) | blue
        elif ttype == 1:  # COLOR transform inverse
            bits = arg
            g2r = (sub & 0xFF).astype(np.int8)
            g2b = ((sub >> 8) & 0xFF).astype(np.int8)
            r2b = ((sub >> 16) & 0xFF).astype(np.int8)
            ty = np.arange(h) >> bits
            tx = np.arange(w) >> bits
            G2R = g2r[np.ix_(ty, tx)].astype(np.int32)
            G2B = g2b[np.ix_(ty, tx)].astype(np.int32)
            R2B = r2b[np.ix_(ty, tx)].astype(np.int32)
            green = ((img >> 8) & 0xFF).astype(np.int8).astype(np.int32)
            red = ((img >> 16) & 0xFF).astype(np.int32)
            red = (red + ((G2R * green) >> 5)) & 0xFF
            red_s = red.astype(np.int8).astype(np.int32)
            blue = (img & 0xFF).astype(np.int32)
            blue = (blue + ((G2B * green) >> 5)
                    + ((R2B * red_s) >> 5)) & 0xFF
            img = ((img & 0xFF00FF00)
                   | (red.astype(np.uint32) << 16)
                   | blue.astype(np.uint32))
        elif ttype == 0:  # PREDICTOR inverse (sequential by definition)
            bits = arg
            modes = ((sub >> 8) & 0xFF).astype(np.int32)
            px = np.zeros((h, w, 4), np.uint8)
            res = np.stack([(img >> 24) & 0xFF, (img >> 16) & 0xFF,
                            (img >> 8) & 0xFF, img & 0xFF],
                           axis=-1).astype(np.uint8)
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = np.array([255, 0, 0, 0], np.uint8)
                    elif y == 0:
                        pred = px[0, x - 1]
                    elif x == 0:
                        pred = px[y - 1, 0]
                    else:
                        mode = int(modes[y >> bits, x >> bits])
                        tr = (px[y - 1, x + 1] if x + 1 < w
                              else px[y, 0])
                        pred = _predict(mode, px[y, x - 1], px[y - 1, x],
                                        px[y - 1, x - 1], tr)
                    px[y, x] = res[y, x] + pred  # uint8 wraps mod 256
            img = (px[:, :, 0].astype(np.uint32) << 24
                   | px[:, :, 1].astype(np.uint32) << 16
                   | px[:, :, 2].astype(np.uint32) << 8
                   | px[:, :, 3].astype(np.uint32))
    return img


def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L chunk payload → HxWx3 (opaque) or HxWx4 uint8 RGB(A)."""
    if len(data) < 5 or data[0] != 0x2F:
        raise CodecError("vp8l: bad signature")
    bits = int.from_bytes(data[1:5], "little")
    w = (bits & 0x3FFF) + 1
    h = ((bits >> 14) & 0x3FFF) + 1
    version = bits >> 29
    if version != 0:
        raise CodecError(f"vp8l: version {version}")
    _check_dims(w, h, "vp8l")
    br = _Bits(data)
    br.pos = 5 * 8
    img = _decode_image(br, w, h, True)
    if img.shape[1] > w:  # sub-byte palette packing over-runs the width
        img = img[:, :w]
    if img.shape != (h, w):
        raise CodecError("vp8l: transform size mismatch")
    a = ((img >> 24) & 0xFF).astype(np.uint8)
    r = ((img >> 16) & 0xFF).astype(np.uint8)
    g = ((img >> 8) & 0xFF).astype(np.uint8)
    b = (img & 0xFF).astype(np.uint8)
    if (a == 255).all():
        return np.dstack([r, g, b])
    return np.dstack([r, g, b, a])


def decode_alpha(chunk: bytes, w: int, h: int) -> np.ndarray:
    """WebP ALPH chunk → HxW uint8 alpha plane.  Compression 0 (raw) or
    1 (the alpha plane coded as the green channel of a headerless VP8L
    stream), then the container's reverse filter (none / horizontal /
    vertical / gradient).  Pre-processed (level-reduced) alpha decodes
    without libwebp's optional smoothing pass — values are exact at the
    quantized levels, a documented cosmetic divergence."""
    if not chunk:
        raise CodecError("webp: empty ALPH chunk")
    head = chunk[0]
    compression = head & 0x3
    filtering = (head >> 2) & 0x3
    body = chunk[1:]
    if compression == 0:
        if len(body) < w * h:
            raise CodecError("webp: truncated raw alpha")
        plane = np.frombuffer(body[:w * h], np.uint8).reshape(h, w).copy()
    elif compression == 1:
        br = _Bits(body)
        img = _decode_image(br, w, h, True)
        if img.shape[1] > w:
            img = img[:, :w]
        if img.shape != (h, w):
            raise CodecError("webp: alpha stream size mismatch")
        plane = ((img >> 8) & 0xFF).astype(np.uint8)  # green channel
    else:
        raise CodecError("webp: bad alpha compression")
    if filtering == 0:
        return plane
    out = np.zeros_like(plane)
    for y in range(h):
        prev = out[y - 1] if y else None
        row = plane[y]
        if filtering == 1 or prev is None:   # horizontal (or first row)
            pred = 0 if prev is None else int(prev[0])
            acc = np.empty(w, np.uint8)
            for x in range(w):
                pred = (pred + int(row[x])) & 0xFF
                acc[x] = pred
            out[y] = acc
        elif filtering == 2:                 # vertical
            out[y] = (prev.astype(np.int32) + row).astype(np.uint8)
        else:                                # gradient
            top_left = int(prev[0])
            left = top_left
            acc = np.empty(w, np.uint8)
            for x in range(w):
                top = int(prev[x])
                g = left + top - top_left
                g = 0 if g < 0 else (255 if g > 255 else g)
                left = (int(row[x]) + g) & 0xFF
                top_left = top
                acc[x] = left
            out[y] = acc
    return out


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF WebP container → pixels.  Both flavors decode for real:
    lossless (VP8L, RFC 9649) here, lossy key frames (VP8, RFC 6386)
    via ``vp8.decode_vp8`` — bit-exact vs libwebp in test_vp8.py.
    That covers the ENTIRE WebP format: the container spec requires
    every still and every ANMF animation frame to be a complete
    independently-decodable image, so VP8 inter frames never occur in
    WebP — they exist only in WebM video essence, where ``vp8.py``
    raises its ``CodecUnavailable`` boundary."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise CodecError("webp: bad container")
    i, n = 12, len(data)
    alpha_chunk = None
    while i + 8 <= n:
        fourcc = data[i:i + 4]
        size = struct.unpack_from("<I", data, i + 4)[0]
        chunk = data[i + 8:i + 8 + size]
        if fourcc == b"ALPH":
            alpha_chunk = chunk
        elif fourcc == b"VP8L":
            return decode_vp8l(chunk)
        elif fourcc == b"VP8 ":
            from .vp8 import decode_vp8
            px = decode_vp8(chunk)
            if alpha_chunk is not None:
                hgt, wid = px.shape[:2]
                a = decode_alpha(alpha_chunk, wid, hgt)
                return np.dstack([px, a])
            return px
        i += 8 + size + (size & 1)
    raise CodecError("webp: no image chunk")


# ---------------------------------------------------------------------------
# fixture encoder


class _BitsW:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> None:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0


def _huff_lengths(freqs: dict[int, int], max_len: int = 15) -> dict:
    """Symbol → code length via heap Huffman; falls back to flat codes
    if the tree exceeds ``max_len`` (fixture streams, not ratios)."""
    if not freqs:
        return {}
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth = {s: 0 for s in freqs}
    tick = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tick, s1 + s2))
        tick += 1
    if max(depth.values()) > max_len:
        flat = max(1, (len(freqs) - 1).bit_length())
        return {s: flat for s in freqs}
    return depth


def _canonical_codes_w(lengths: dict[int, int]) -> dict:
    """Symbol → (code, len) matching the decoder's canonical order."""
    by_len: dict[int, list[int]] = {}
    for s, length in lengths.items():
        by_len.setdefault(length, []).append(s)
    out = {}
    code = 0
    for length in range(1, 17):
        for s in sorted(by_len.get(length, [])):
            out[s] = (code, length)
            code += 1
        code <<= 1
    return out


def _write_prefix_code(bw: _BitsW, lengths: dict[int, int],
                       alphabet_size: int) -> dict:
    """Emit one prefix code (simple when possible) and return the
    symbol → (code, len) encode table."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] < 2 and len(syms) == 1:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    bw.write(0, 1)  # code-length-coded
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    # trim trailing zeros via the max_symbol field
    last = max(s for s, length in enumerate(full) if length)
    cl_freqs: dict[int, int] = {}
    for length in full[:last + 1]:
        cl_freqs[length] = cl_freqs.get(length, 0) + 1
    cl_lengths = _huff_lengths(cl_freqs, max_len=7)
    bw.write(19 - 4, 4)  # all 19 code-length slots
    for s in _CL_ORDER:
        bw.write(cl_lengths.get(s, 0), 3)
    n_emit = last + 1
    bw.write(1, 1)  # use max_symbol
    nbits_slot = 0
    while (1 << (2 + 2 * nbits_slot)) - 1 + 2 < n_emit:
        nbits_slot += 1
    bw.write(nbits_slot, 3)
    bw.write(n_emit - 2, 2 + 2 * nbits_slot)
    if len(cl_lengths) == 1:
        # single-symbol code: the decoder consumes ZERO bits per symbol
        cl_codes = {next(iter(cl_lengths)): (0, 0)}
    else:
        cl_codes = _canonical_codes_w(cl_lengths)
    for length in full[:last + 1]:
        c, ln = cl_codes[length]
        _write_code(bw, c, ln)
    if len(lengths) == 1:
        return {next(iter(lengths)): (0, 0)}
    return _canonical_codes_w(lengths)


def _write_code(bw: _BitsW, code: int, length: int) -> None:
    """Prefix-code bits go MSB-first into the LSB-first stream."""
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _rev(code: int, length: int) -> int:
    out = 0
    for _ in range(length):
        out = (out << 1) | (code & 1)
        code >>= 1
    return out


def _prefix_slot(v: int):
    """value → (slot, extra_bits_value, extra_bits_count); inverse of
    ``_prefix_value``."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    eb = x.bit_length() - 2
    top = x >> eb
    slot = 2 * eb + (top - 2) + 2
    offset = top << eb
    return slot, x - offset, eb


def _forward_predictor(px: np.ndarray, mode: int) -> np.ndarray:
    """Forward PREDICTOR transform (constant mode): residual = pixel -
    prediction, mod 256, in scan order over the spec's neighbor rules.
    Exact inverse of `_apply_inverse_transforms` type 0."""
    h, w, _ = px.shape
    res = np.empty_like(px)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.uint8)
            elif y == 0:
                pred = px[0, x - 1]
            elif x == 0:
                pred = px[y - 1, 0]
            else:
                tr = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                pred = _predict(mode, px[y, x - 1], px[y - 1, x],
                                px[y - 1, x - 1], tr)
            res[y, x] = px[y, x] - pred  # uint8 wraps mod 256
    return res


def _forward_color(argb: np.ndarray, g2r: int, g2b: int,
                   r2b: int) -> np.ndarray:
    """Forward COLOR transform (constant element): subtract the same
    shifted cross-channel terms the decoder adds back."""
    green_s = ((argb >> 8) & 0xFF).astype(np.int8).astype(np.int32)
    red = ((argb >> 16) & 0xFF).astype(np.int32)
    blue = (argb & 0xFF).astype(np.int32)
    red_t = (red - ((g2r * green_s) >> 5)) & 0xFF
    # the decoder's red_s is the *reconstructed* (= original) red, signed
    red_s = red.astype(np.uint8).view(np.int8).astype(np.int32)
    blue_t = (blue - ((g2b * green_s) >> 5) - ((r2b * red_s) >> 5)) & 0xFF
    return ((argb & 0xFF00FF00)
            | (red_t.astype(np.uint32) << 16)
            | blue_t.astype(np.uint32))


def encode_vp8l(img: np.ndarray, subtract_green: bool = False,
                palette: bool = False, use_lz77: bool = False,
                cache_bits: int = 0,
                predictor_mode: int | None = None,
                predictor_bits: int = 4,
                color_elt: tuple[int, int, int] | None = None,
                color_bits: int = 4,
                meta_bits: int = 0) -> bytes:
    """Legal VP8L stream for an HxWx{3,4} uint8 image.  Options select
    decoder paths: SUBTRACT_GREEN transform, COLOR_INDEXING palette,
    PREDICTOR (constant mode over `predictor_bits` tiles), COLOR
    (constant `(g2r, g2b, r2b)` element), a meta-prefix entropy image
    (`meta_bits`, single group), RLE LZ77 back-references, color
    cache."""
    img = np.atleast_3d(img.astype(np.uint8))
    h, w, c = img.shape
    if c == 1:
        img = np.repeat(img, 3, axis=2)
        c = 3
    alpha = (img[:, :, 3] if c >= 4
             else np.full((h, w), 255, np.uint8))
    argb = (alpha.astype(np.uint32) << 24
            | img[:, :, 0].astype(np.uint32) << 16
            | img[:, :, 1].astype(np.uint32) << 8
            | img[:, :, 2].astype(np.uint32))

    bw = _BitsW()
    out = bytearray([0x2F])
    hdr = (w - 1) | ((h - 1) << 14) | ((1 if c >= 4 else 0) << 28)
    out += hdr.to_bytes(4, "little")

    coded = argb
    if palette:
        colors, inverse = np.unique(argb.reshape(-1), return_inverse=True)
        if len(colors) > 256:
            raise CodecError("vp8l: too many colors for palette")
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(colors) - 1, 8)
        # delta-coded palette written as a 1×n literal image
        pal_px = colors.view(np.uint8).reshape(-1, 4).astype(np.int32)
        deltas = pal_px.copy()
        deltas[1:] -= pal_px[:-1]
        deltas &= 0xFF
        pal_argb = (deltas[:, 3].astype(np.uint32) << 24
                    | deltas[:, 2].astype(np.uint32) << 16
                    | deltas[:, 1].astype(np.uint32) << 8
                    | deltas[:, 0].astype(np.uint32))
        _encode_literal_image(bw, pal_argb.reshape(1, -1), level0=False)
        idx = inverse.reshape(h, w).astype(np.uint32)
        pal_size = len(colors)
        ib = (3 if pal_size <= 2 else 2 if pal_size <= 4
              else 1 if pal_size <= 16 else 0)
        if ib:
            per = 1 << ib
            bits = 8 >> ib
            packed = np.zeros((h, _sub_size(w, ib)), np.uint32)
            for i in range(per):
                cols = idx[:, i::per]
                packed[:, :cols.shape[1]] |= cols << (i * bits)
            idx = packed
        coded = idx << 8  # indices ride in the green channel
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)  # SUBTRACT_GREEN
            green = (coded >> 8) & 0xFF
            red = (((coded >> 16) & 0xFF) - green) & 0xFF
            blue = ((coded & 0xFF) - green) & 0xFF
            coded = (coded & 0xFF00FF00) | (red << 16) | blue
        if color_elt is not None:
            g2r, g2b, r2b = color_elt
            bw.write(1, 1)
            bw.write(1, 2)  # COLOR
            bw.write(color_bits - 2, 3)
            elt_px = (np.uint32(0xFF) << 24
                      | np.uint32(r2b & 0xFF) << 16
                      | np.uint32(g2b & 0xFF) << 8
                      | np.uint32(g2r & 0xFF))
            sub = np.full((_sub_size(h, color_bits),
                           _sub_size(w, color_bits)), elt_px, np.uint32)
            _encode_literal_image(bw, sub, level0=False)
            coded = _forward_color(coded, g2r, g2b, r2b)
        if predictor_mode is not None:
            bw.write(1, 1)
            bw.write(0, 2)  # PREDICTOR
            bw.write(predictor_bits - 2, 3)  # stored as bits-2
            mode_px = np.uint32(0xFF000000 | (predictor_mode << 8))
            sub = np.full((_sub_size(h, predictor_bits),
                           _sub_size(w, predictor_bits)), mode_px,
                          np.uint32)
            _encode_literal_image(bw, sub, level0=False)
            px = np.stack([(coded >> 24) & 0xFF, (coded >> 16) & 0xFF,
                           (coded >> 8) & 0xFF, coded & 0xFF],
                          axis=-1).astype(np.uint8)
            res = _forward_predictor(px, predictor_mode)
            coded = (res[:, :, 0].astype(np.uint32) << 24
                     | res[:, :, 1].astype(np.uint32) << 16
                     | res[:, :, 2].astype(np.uint32) << 8
                     | res[:, :, 3].astype(np.uint32))
    bw.write(0, 1)  # no more transforms
    _encode_literal_image(bw, coded, use_lz77=use_lz77,
                          cache_bits=cache_bits, meta_bits=meta_bits)
    bw.flush()
    payload = bytes(out) + bytes(bw.out)
    riff = (b"WEBPVP8L" + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _encode_literal_image(bw: _BitsW, argb: np.ndarray,
                          use_lz77: bool = False,
                          cache_bits: int = 0,
                          level0: bool = True,
                          meta_bits: int = 0) -> None:
    """Entropy-coded image body: cache bit, no meta, per-channel codes,
    then literal / RLE / cache-coded pixels.  Transform sub-images
    (``level0=False``) carry no meta-prefix bit (RFC 9649 §5).
    ``meta_bits`` emits a constant group-0 meta-prefix image (single
    entropy group) to exercise the decoder's meta path."""
    flat = [int(v) for v in argb.reshape(-1)]
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        if meta_bits:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mh, mw = argb.shape
            meta = np.full((_sub_size(mh, meta_bits),
                            _sub_size(mw, meta_bits)),
                           np.uint32(0xFF000000), np.uint32)
            _encode_literal_image(bw, meta, level0=False)
        else:
            bw.write(0, 1)  # no meta-prefix image

    # token stream: ("lit", px) | ("copy", length) | ("cache", idx)
    tokens = []
    cache = [None] * ((1 << cache_bits) if cache_bits else 0)
    i, n = 0, len(flat)
    while i < n:
        px = flat[i]
        if use_lz77 and i > 0 and flat[i - 1] == px:
            run = 1
            while (i + run < n and flat[i + run] == px
                   and run < 4096):
                run += 1
            tokens.append(("copy", run))
            if cache_bits:
                for j in range(run):
                    cache[(0x1E35A7BD * flat[i + j] & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = flat[i + j]
            i += run
            continue
        if cache_bits:
            key = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[key] == px:
                tokens.append(("cache", key))
                i += 1
                continue
            cache[key] = px
        tokens.append(("lit", px))
        i += 1

    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for kind, v in tokens:
        if kind == "lit":
            gf[(v >> 8) & 0xFF] = gf.get((v >> 8) & 0xFF, 0) + 1
            rf[(v >> 16) & 0xFF] = rf.get((v >> 16) & 0xFF, 0) + 1
            bf[v & 0xFF] = bf.get(v & 0xFF, 0) + 1
            af[(v >> 24) & 0xFF] = af.get((v >> 24) & 0xFF, 0) + 1
        elif kind == "copy":
            slot, _, _ = _prefix_slot(v)
            gf[256 + slot] = gf.get(256 + slot, 0) + 1
            dslot, _, _ = _prefix_slot(121)  # distance 1 → code 121
            df[dslot] = df.get(dslot, 0) + 1
        else:
            gf[280 + v] = gf.get(280 + v, 0) + 1
    for f in (rf, bf, af, df):
        if not f:
            f[0] = 1  # every group carries all five codes
    cache_size = (1 << cache_bits) if cache_bits else 0
    gt = _write_prefix_code(bw, _huff_lengths(gf), 256 + 24 + cache_size)
    rt = _write_prefix_code(bw, _huff_lengths(rf), 256)
    bt = _write_prefix_code(bw, _huff_lengths(bf), 256)
    at = _write_prefix_code(bw, _huff_lengths(af), 256)
    dt = _write_prefix_code(bw, _huff_lengths(df), 40)

    for kind, v in tokens:
        if kind == "lit":
            c, ln = gt[(v >> 8) & 0xFF]
            _write_code(bw, c, ln)
            c, ln = rt[(v >> 16) & 0xFF]
            _write_code(bw, c, ln)
            c, ln = bt[v & 0xFF]
            _write_code(bw, c, ln)
            c, ln = at[(v >> 24) & 0xFF]
            _write_code(bw, c, ln)
        elif kind == "copy":
            slot, extra, eb = _prefix_slot(v)
            c, ln = gt[256 + slot]
            _write_code(bw, c, ln)
            bw.write(extra, eb)
            dslot, dextra, deb = _prefix_slot(121)
            c, ln = dt[dslot]
            _write_code(bw, c, ln)
            bw.write(dextra, deb)
        else:
            c, ln = gt[280 + v]
            _write_code(bw, c, ln)


def decode_webp_frames(data: bytes, max_frames: int | None = None
                       ) -> list[tuple[np.ndarray, int]]:
    """Animated WebP (VP8X + ANIM/ANMF) → [(RGBA canvas snapshot,
    ts_ms)].  Frame compositing follows the container spec: sub-frames
    placed at (2*x, 2*y), blend none/alpha-over, dispose none/background.
    A still WebP yields its single frame at ts 0.  Both essence flavors
    decode for real (VP8L here, VP8 via the RFC 6386 decoder)."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise CodecError("webp: bad container")
    canvas_w = canvas_h = None
    frames = []       # (x, y, dur_ms, blend, dispose, essence bytes)
    i, n = 12, len(data)
    still = None
    while i + 8 <= n:
        fourcc = data[i:i + 4]
        size = struct.unpack_from("<I", data, i + 4)[0]
        chunk = data[i + 8:i + 8 + size]
        if fourcc == b"VP8X" and len(chunk) >= 10:
            canvas_w = 1 + int.from_bytes(chunk[4:7], "little")
            canvas_h = 1 + int.from_bytes(chunk[7:10], "little")
        elif fourcc == b"ANMF" and len(chunk) >= 16:
            fx = 2 * int.from_bytes(chunk[0:3], "little")
            fy = 2 * int.from_bytes(chunk[3:6], "little")
            dur = int.from_bytes(chunk[12:15], "little")
            flags = chunk[15]
            frames.append((fx, fy, dur, flags & 2, flags & 1, chunk[16:]))
        elif fourcc in (b"VP8 ", b"VP8L") and still is None:
            still = chunk if fourcc == b"VP8L" else None
            if fourcc == b"VP8 ":
                from .vp8 import decode_vp8
                still = ("vp8", chunk)
            else:
                still = ("vp8l", chunk)
        i += 8 + size + (size & 1)

    def essence_rgba(payload: bytes) -> np.ndarray:
        """Image (+ optional ALPH) chunks inside an ANMF body."""
        j = 0
        alpha = None
        while j + 8 <= len(payload):
            tag = payload[j:j + 4]
            sz = struct.unpack_from("<I", payload, j + 4)[0]
            body = payload[j + 8:j + 8 + sz]
            if tag == b"ALPH":
                alpha = body
            elif tag == b"VP8L":
                return _rgba(decode_vp8l(body))
            elif tag == b"VP8 ":
                from .vp8 import decode_vp8
                px = decode_vp8(body)
                if alpha is not None:
                    a = decode_alpha(alpha, px.shape[1], px.shape[0])
                    return np.dstack([px, a])
                return _rgba(px)
            j += 8 + sz + (sz & 1)
        raise CodecError("webp: ANMF without image chunk")

    if not frames:
        if still is None:
            raise CodecError("webp: no image chunk")
        kind, chunk = still
        px = decode_vp8l(chunk) if kind == "vp8l" else None
        if px is None:
            from .vp8 import decode_vp8
            px = decode_vp8(chunk)
        return [(_rgba(px), 0)]

    if canvas_w is None:
        raise CodecError("webp: ANMF without VP8X canvas")
    _check_dims(canvas_w, canvas_h, "webp")
    canvas = np.zeros((canvas_h, canvas_w, 4), np.uint8)
    out: list[tuple[np.ndarray, int]] = []
    ts = 0
    for fx, fy, dur, no_blend, dispose_bg, payload in frames:
        region = essence_rgba(payload)
        fh, fw = region.shape[:2]
        if fx + fw > canvas_w or fy + fh > canvas_h:
            raise CodecError("webp: frame outside canvas")
        target = canvas[fy:fy + fh, fx:fx + fw]
        if no_blend:
            target[:] = region
        else:
            # container-spec alpha-over on a NON-premultiplied canvas
            # (both src and dst alphas weight the RGB — a src blended
            # over a partially transparent canvas must not inherit the
            # canvas RGB at full weight):
            #   a_out = a_s + a_d*(1-a_s)
            #   rgb_out = (rgb_s*a_s + rgb_d*a_d*(1-a_s)) / a_out
            a_s = region[:, :, 3:4].astype(np.uint32)
            a_d = target[:, :, 3:4].astype(np.uint32)
            wd = a_d * (255 - a_s) // 255          # dst weight, 0..255
            a_out = a_s + wd
            num = (region[:, :, :3].astype(np.uint32) * a_s
                   + target[:, :, :3].astype(np.uint32) * wd)
            den = np.where(a_out == 0, 1, a_out)
            target[:, :, :3] = (num // den).astype(np.uint8)
            target[:, :, 3:4] = a_out.astype(np.uint8)
        out.append((canvas.copy(), ts))
        ts += dur
        if dispose_bg:
            target[:] = 0
        if max_frames is not None and len(out) >= max_frames:
            break
    return out


def _rgba(px: np.ndarray) -> np.ndarray:
    if px.shape[2] == 4:
        return px
    return np.concatenate(
        [px, np.full(px.shape[:2] + (1,), 255, np.uint8)], axis=2)


def encode_webp_anim(frames: list, delays_ms: list,
                     lossless: bool = True) -> bytes:
    """Fixture writer: full-canvas RGBA frames → animated WebP
    (VP8X + ANIM + per-frame ANMF wrapping VP8L essence)."""
    if not frames or len(frames) != len(delays_ms):
        raise ValueError("frames/delays mismatch")
    h, w = frames[0].shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    vp8x = chunk(b"VP8X", bytes([0x02]) + b"\x00" * 3
                 + (w - 1).to_bytes(3, "little")
                 + (h - 1).to_bytes(3, "little"))
    anim = chunk(b"ANIM", struct.pack("<IH", 0, 0))
    body = vp8x + anim
    for img, dur in zip(frames, delays_ms):
        riff = encode_vp8l(np.ascontiguousarray(img))
        # strip the still-image RIFF wrapper down to the VP8L payload
        essence_len = struct.unpack("<I", riff[16:20])[0]
        essence = riff[20:20 + essence_len]
        payload = (b"\x00" * 6            # x=y=0
                   + (w - 1).to_bytes(3, "little")
                   + (h - 1).to_bytes(3, "little")
                   + int(dur).to_bytes(3, "little")
                   + bytes([0x02])        # no-blend (full-canvas frames)
                   + chunk(b"VP8L", essence))
        body += chunk(b"ANMF", payload)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
