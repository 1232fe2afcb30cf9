"""VP8L (WebP lossless) decoder tests, driven by a hand-built VP8L
encoder (the same strategy as the JPEG tests: the fixture writer lives
here, the decoder under test lives in the package and shares no code
with it)."""

from __future__ import annotations

import heapq
import struct

import numpy as np
import pytest

from simplecommoncrawlextractor_spark.operators._vp8l import (
    _DIST_MAP,
    decode_vp8l_chunk,
)
from simplecommoncrawlextractor_spark.operators.multimodal import decode_image

_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _W:
    """LSB-first bit writer (fixed-width fields low-bit first; prefix
    codes are written bit by bit from the code's MSB)."""

    def __init__(self):
        self.bits = []

    def put(self, value, nbits):
        for i in range(nbits):
            self.bits.append((value >> i) & 1)

    def put_code(self, code, length):
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _huffman_lengths(freqs):
    """Optimal (hence Kraft-complete) code lengths for a frequency map."""
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, {s: 0}) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    tie = len(heap)
    while len(heap) > 1:
        f1, _, d1 = heapq.heappop(heap)
        f2, _, d2 = heapq.heappop(heap)
        merged = {s: d + 1 for s, d in d1.items()}
        merged.update({s: d + 1 for s, d in d2.items()})
        heapq.heappush(heap, (f1 + f2, tie, merged))
        tie += 1
    return heap[0][2]


def _canonical(lengths):
    """Symbol -> (code, length), canonical DEFLATE-style assignment."""
    nz = sorted((l, s) for s, l in lengths.items() if l)
    codes, code, cur = {}, 0, 0
    for l, s in nz:
        code <<= l - cur
        cur = l
        codes[s] = (code, l)
        code += 1
    return codes


def _write_normal_code(bw, lengths, alphabet):
    """The code-length-coded ('normal') prefix-code form."""
    used = sorted(s for s, l in lengths.items() if l)
    ops = []  # ("lit", cl) | (17, rep) | (18, rep)
    sym = 0
    for s in used:
        gap = s - sym
        while gap >= 11:
            r = min(gap, 138)
            ops.append((18, r))
            gap -= r
        while gap >= 3:
            r = min(gap, 10)
            ops.append((17, r))
            gap -= r
        for _ in range(gap):
            ops.append(("lit", 0))
        ops.append(("lit", lengths[s]))
        sym = s + 1
    if sym < alphabet and len(ops) < 2:
        ops.append(("lit", 0))  # max_symbol = 2 + v needs at least 2 ops
    clc_freq = {}
    for op, v in ops:
        key = v if op == "lit" else op
        clc_freq[key] = clc_freq.get(key, 0) + 1
    clc_len = _huffman_lengths(clc_freq)
    assert all(l <= 7 for l in clc_len.values())
    clc_codes = _canonical(clc_len)
    n = max(4, max(_CLC_ORDER.index(s) for s in clc_len) + 1)
    bw.put(0, 1)  # not simple
    bw.put(n - 4, 4)
    for i in range(n):
        bw.put(clc_len.get(_CLC_ORDER[i], 0), 3)
    if sym == alphabet:
        bw.put(0, 1)  # ops cover the whole alphabet; no explicit cap
    else:
        v = len(ops) - 2
        k = 0
        while v >= 1 << (2 + 2 * k):
            k += 1
        bw.put(1, 1)
        bw.put(k, 3)
        bw.put(v, 2 + 2 * k)

    def emit(symbol):
        if len(clc_len) == 1:  # trivial clc: zero bits per op
            return
        c, l = clc_codes[symbol]
        bw.put_code(c, l)

    for op, v in ops:
        if op == "lit":
            emit(v)
        elif op == 17:
            emit(17)
            bw.put(v - 3, 3)
        else:
            emit(18)
            bw.put(v - 11, 7)


def _write_prefix_code(bw, lengths, alphabet, force_normal=False):
    used = sorted(s for s, l in lengths.items() if l)
    if not force_normal and 1 <= len(used) <= 2 and max(used) <= 255:
        bw.put(1, 1)  # simple
        bw.put(len(used) - 1, 1)
        if used[0] > 1:
            bw.put(1, 1)
            bw.put(used[0], 8)
        else:
            bw.put(0, 1)
            bw.put(used[0], 1)
        if len(used) == 2:
            bw.put(used[1], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}  # trivial: zero bits per symbol
        return _canonical({s: 1 for s in used})
    _write_normal_code(bw, lengths, alphabet)
    if len(used) == 1:
        return {used[0]: (0, 0)}  # decoder treats 1-symbol codes as 0-bit
    return _canonical(lengths)


def _prefix_encode(v):
    """value -> (prefix code, n extra bits, extra value); inverse of the
    decoder's _prefix_value."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= v <= offset + (1 << extra):
            return code, extra, v - offset - 1
    raise AssertionError("value out of range")


def _green_of(argb):
    return (argb >> 8) & 0xFF


def _cache_slot(argb, bits):
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _emit_image_data(bw, tokens, cache_bits=0, force_normal=False,
                     meta=None, width=None, sub=False):
    """Write color-cache info, (optional) meta codes, prefix-code
    groups, and the LZ77 token stream.

    tokens: list of ("lit", argb) | ("copy", length, raw_dist) |
    ("cache", slot).  raw_dist is the plain pixel distance (encoded as
    dist+120) unless negative, in which case -raw_dist is a 1-based
    neighbor-map code.  meta: (meta_bits, meta_w, group_index_list,
    n_groups) — group per token chosen by the pixel position where the
    token starts."""
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)

    n_groups = 1
    group_at = None
    if meta is not None:
        meta_bits, meta_w, meta_idx, n_groups = meta
        bw.put(1, 1)
        bw.put(meta_bits - 2, 3)
        _emit_image_data(
            bw,
            [("lit", 0xFF000000 | (gi << 8)) for gi in meta_idx],
            sub=True,
        )

        def group_at(pos):
            x, y = pos % width, pos // width
            return meta_idx[(y >> meta_bits) * meta_w + (x >> meta_bits)]
    elif not sub:
        bw.put(0, 1)  # subimages carry no meta bit at all

    # frequency scan per group
    def tok_group(pos):
        return group_at(pos) if group_at else 0

    freqs = [
        [dict(), dict(), dict(), dict(), dict()] for _ in range(n_groups)
    ]
    pos = 0
    for t in tokens:
        g = freqs[tok_group(pos)]

        def bump(d, s):
            d[s] = d.get(s, 0) + 1

        if t[0] == "lit":
            px = t[1]
            bump(g[0], _green_of(px))
            bump(g[1], (px >> 16) & 0xFF)
            bump(g[2], px & 0xFF)
            bump(g[3], (px >> 24) & 0xFF)
            pos += 1
        elif t[0] == "copy":
            _, length, dist = t
            bump(g[0], 256 + _prefix_encode(length)[0])
            dval = dist + 120 if dist >= 0 else -dist
            bump(g[4], _prefix_encode(dval)[0])
            pos += length
        else:
            bump(g[0], 256 + 24 + t[1])
            pos += 1

    alphabets = (256 + 24 + ((1 << cache_bits) if cache_bits else 0),
                 256, 256, 256, 40)
    group_codes = []
    for g in range(n_groups):
        codes5 = []
        for ai, alpha in enumerate(alphabets):
            f = freqs[g][ai]
            if not f:
                f = {0: 1}  # unused code: single dummy symbol
            lens = _huffman_lengths(f)
            codes5.append(
                _write_prefix_code(bw, lens, alpha, force_normal=force_normal)
            )
        group_codes.append(codes5)

    pos = 0
    for t in tokens:
        codes = group_codes[tok_group(pos)]
        if t[0] == "lit":
            px = t[1]
            bw.put_code(*codes[0][_green_of(px)])
            bw.put_code(*codes[1][(px >> 16) & 0xFF])
            bw.put_code(*codes[2][px & 0xFF])
            bw.put_code(*codes[3][(px >> 24) & 0xFF])
            pos += 1
        elif t[0] == "copy":
            _, length, dist = t
            c, nb, ev = _prefix_encode(length)
            bw.put_code(*codes[0][256 + c])
            bw.put(ev, nb)
            dval = dist + 120 if dist >= 0 else -dist
            c, nb, ev = _prefix_encode(dval)
            bw.put_code(*codes[4][c])
            bw.put(ev, nb)
            pos += length
        else:
            bw.put_code(*codes[0][256 + 24 + t[1]])
            pos += 1


def _wrap_riff(bitstream, vp8x=False):
    chunk = b"\x2f" + bitstream
    body = b"VP8L" + struct.pack("<I", len(chunk)) + chunk
    if len(chunk) & 1:
        body += b"\x00"
    if vp8x:
        x = b"VP8X" + struct.pack("<I", 10) + b"\x00\x00\x00\x00" + b"\x01\x00\x00" + b"\x01\x00\x00"
        body = x + body
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def _header(bw, w, h):
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version


def _make_vp8l(w, h, tokens, cache_bits=0, force_normal=False,
               transforms=(), meta=None):
    """transforms: raw-callback list writing their own bits (already in
    read order); tokens describe the post-transform image."""
    bw = _W()
    _header(bw, w, h)
    for t in transforms:
        t(bw)
    bw.put(0, 1)  # no more transforms
    _emit_image_data(bw, tokens, cache_bits=cache_bits,
                     force_normal=force_normal, meta=meta, width=w)
    return _wrap_riff(bw.bytes())


def _lits(pixels):
    return [("lit", p) for p in pixels]


def _argb(r, g, b, a=0xFF):
    return (a << 24) | (r << 16) | (g << 8) | b


def _rgb_array(pixels):
    return np.array(
        [[(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF] for p in pixels],
        dtype=np.uint8,
    )


def _decode(payload):
    out = decode_vp8l_chunk(payload[payload.index(b"VP8L") + 8:])
    return out


# -- tests ----------------------------------------------------------------


def test_distance_map_structure_and_rfc_prefix():
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    assert all(y > 0 or x > 0 for x, y in _DIST_MAP)
    assert _DIST_MAP[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
        (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
        (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    assert _DIST_MAP[22:34] == [
        (0, 4), (4, 0), (1, 4), (-1, 4), (4, 1), (-4, 1),
        (3, 3), (-3, 3), (2, 4), (-2, 4), (4, 2), (-4, 2),
    ]


def test_simple_code_two_color_literals():
    a, b = _argb(200, 10, 30), _argb(5, 250, 120)
    pixels = [a, b, b, a, a, a, b, a]
    payload = _make_vp8l(4, 2, _lits(pixels))
    w, h, rgb = _decode(payload)
    assert (w, h) == (4, 2)
    assert np.array_equal(rgb, _rgb_array(pixels))


def test_normal_code_many_colors():
    colors = [_argb(i * 13 % 256, i * 57 % 256, i * 199 % 256) for i in range(9)]
    pixels = [colors[(x * 7 + y) % 9] for y in range(5) for x in range(6)]
    payload = _make_vp8l(6, 5, _lits(pixels), force_normal=True)
    w, h, rgb = _decode(payload)
    assert (w, h) == (6, 5)
    assert np.array_equal(rgb, _rgb_array(pixels))


def test_backward_refs_raw_distance_and_overlap():
    base = [_argb(1, 2, 3), _argb(4, 5, 6), _argb(7, 8, 9), _argb(10, 11, 12)]
    # 4 literals, then an overlapping copy: length 8, distance 4
    tokens = _lits(base) + [("copy", 8, 4)]
    pixels = base * 3
    payload = _make_vp8l(4, 3, tokens, force_normal=True)
    w, h, rgb = _decode(payload)
    assert (w, h) == (4, 3)
    assert np.array_equal(rgb, _rgb_array(pixels))


def test_backward_refs_neighbor_map_codes():
    # code 2 = (1, 0) = distance 1 (repeat left pixel);
    # code 1 = (0, 1) = distance w (repeat the pixel above)
    a, b = _argb(9, 9, 9), _argb(20, 30, 40)
    tokens = [("lit", a), ("copy", 3, -2), ("lit", b),
              ("copy", 3, -2), ("copy", 4, -1)]
    pixels = [a, a, a, a, b, b, b, b, b, b, b, b]
    payload = _make_vp8l(4, 3, tokens)
    w, h, rgb = _decode(payload)
    assert (w, h) == (4, 3)
    assert np.array_equal(rgb, _rgb_array(pixels))


def test_color_cache_hits():
    bits = 4
    a, b = _argb(123, 45, 67), _argb(89, 200, 12)
    sa, sb = _cache_slot(a, bits), _cache_slot(b, bits)
    assert sa != sb
    tokens = [("lit", a), ("lit", b), ("cache", sa), ("cache", sb),
              ("cache", sa), ("lit", a)]
    pixels = [a, b, a, b, a, a]
    payload = _make_vp8l(3, 2, tokens, cache_bits=bits)
    w, h, rgb = _decode(payload)
    assert np.array_equal(rgb, _rgb_array(pixels))


def test_cache_updated_during_copies():
    bits = 6
    a, b = _argb(17, 34, 51), _argb(68, 85, 102)
    sa = _cache_slot(a, bits)
    # a b, copy of (a b), then a cache hit for a — the slot was filled
    # by the COPY, proving copies insert into the cache
    tokens = [("lit", a), ("lit", b), ("copy", 2, 2), ("cache", sa), ("lit", b)]
    pixels = [a, b, a, b, a, b]
    payload = _make_vp8l(3, 2, tokens, cache_bits=bits)
    _, _, rgb = _decode(payload)
    assert np.array_equal(rgb, _rgb_array(pixels))


def test_subtract_green_transform():
    pixels = [_argb(r, g, b) for r, g, b in
              [(200, 100, 50), (10, 240, 30), (255, 255, 255), (1, 2, 3)]]
    residual = [
        _argb((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF,
              (p >> 8) & 0xFF,
              ((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
        for p in pixels
    ]

    def t_subgreen(bw):
        bw.put(1, 1)
        bw.put(2, 2)

    payload = _make_vp8l(2, 2, _lits(residual), transforms=[t_subgreen])
    w, h, rgb = _decode(payload)
    assert np.array_equal(rgb, _rgb_array(pixels))


def _predict(mode, l, t, tl, tr):
    def avg2(p, q):
        return tuple((pc + qc) // 2 for pc, qc in zip(p, q))

    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 7:
        return avg2(l, t)
    if mode == 12:
        return tuple(min(255, max(0, lc + tc - tlc))
                     for lc, tc, tlc in zip(l, t, tl))
    raise AssertionError


def test_predictor_transform_single_block():
    # 4x4 gradient, one 16px block, mode 7 (Average2(L, T)); forced
    # edge rules: (0,0) black, top row L, left column T
    w = h = 4
    pix = [
        tuple(((x * 37 + y * 91 + c * 13) % 256) for c in range(4))
        for y in range(h)
        for x in range(w)
    ]  # (a, r, g, b)

    def at(x, y):
        return pix[y * w + x]

    residuals = []
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = at(x - 1, y)
            elif x == 0:
                pred = at(x, y - 1)
            else:
                pred = _predict(7, at(x - 1, y), at(x, y - 1),
                                at(x - 1, y - 1),
                                at(x + 1, y - 1) if x + 1 < w else at(0, y))
            residuals.append(tuple((pc - qc) & 0xFF for pc, qc in zip(at(x, y), pred)))

    def pack(t):
        return (t[0] << 24) | (t[1] << 16) | (t[2] << 8) | t[3]

    def t_pred(bw):
        bw.put(1, 1)
        bw.put(0, 2)
        bw.put(2, 3)  # size_bits = 4 -> 16x16 blocks -> 1x1 subimage
        _emit_image_data(bw, [("lit", 0xFF000000 | (7 << 8))], sub=True)

    payload = _make_vp8l(w, h, _lits([pack(r) for r in residuals]),
                         transforms=[t_pred], force_normal=True)
    dw, dh, rgb = _decode(payload)
    assert (dw, dh) == (w, h)
    want = np.array([[p[1], p[2], p[3]] for p in pix], dtype=np.uint8)
    assert np.array_equal(rgb, want)


def test_predictor_transform_per_block_modes():
    # 8x4 with 4x4 blocks: left block mode 1 (L), right block mode 2 (T)
    w, h = 8, 4
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 256, size=(h, w, 4))
    pix = [tuple(int(v) for v in vals[y, x]) for y in range(h) for x in range(w)]

    def at(x, y):
        return pix[y * w + x]

    residuals = []
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = at(x - 1, y)
            elif x == 0:
                pred = at(x, y - 1)
            else:
                mode = 1 if x < 4 else 2
                pred = _predict(mode, at(x - 1, y), at(x, y - 1), None, None)
            residuals.append(tuple((pc - qc) & 0xFF for pc, qc in zip(at(x, y), pred)))

    def pack(t):
        return (t[0] << 24) | (t[1] << 16) | (t[2] << 8) | t[3]

    def t_pred(bw):
        bw.put(1, 1)
        bw.put(0, 2)
        bw.put(0, 3)  # size_bits = 2 -> 4x4 blocks -> 2x1 subimage
        _emit_image_data(
            bw,
            [("lit", 0xFF000000 | (1 << 8)), ("lit", 0xFF000000 | (2 << 8))],
            sub=True,
        )

    payload = _make_vp8l(w, h, _lits([pack(r) for r in residuals]),
                         transforms=[t_pred], force_normal=True)
    _, _, rgb = _decode(payload)
    want = np.array([[p[1], p[2], p[3]] for p in pix], dtype=np.uint8)
    assert np.array_equal(rgb, want)


def test_color_transform_roundtrip():
    w, h = 4, 4
    g2r, g2b, r2b = 23, -17, 5  # int8 multipliers

    def delta(t, c):
        c8 = c - 256 if c >= 128 else c
        return (t * c8) >> 5

    rng = np.random.default_rng(11)
    pix = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(w * h)]
    residual = []
    for r, g, b in pix:
        nr = (r - delta(g2r, g)) & 0xFF
        nb = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
        residual.append(_argb(nr, g, nb))

    def t_color(bw):
        bw.put(1, 1)
        bw.put(1, 2)
        bw.put(2, 3)  # 16x16 blocks -> single element
        cte = 0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
        _emit_image_data(bw, [("lit", cte)], sub=True)

    payload = _make_vp8l(w, h, _lits(residual), transforms=[t_color],
                         force_normal=True)
    _, _, rgb = _decode(payload)
    want = np.array(pix, dtype=np.uint8)
    assert np.array_equal(rgb, want)


def test_color_indexing_with_bundling():
    # 4-entry palette -> 2 bits/index, 4 indices per packed green byte
    w, h = 10, 3
    palette = [_argb(250, 0, 0), _argb(0, 250, 0), _argb(0, 0, 250),
               _argb(40, 50, 60)]
    idx = [(x + y) % 4 for y in range(h) for x in range(w)]

    deltas = []
    prev = 0
    for p in palette:
        deltas.append(
            ((((p >> 24) - (prev >> 24)) & 0xFF) << 24)
            | ((((p >> 16) - (prev >> 16)) & 0xFF) << 16)
            | ((((p >> 8) - (prev >> 8)) & 0xFF) << 8)
            | ((p - prev) & 0xFF)
        )
        prev = p

    packed_w = (w + 3) // 4
    packed = []
    for y in range(h):
        for px in range(packed_w):
            g = 0
            for j in range(4):
                x = px * 4 + j
                if x < w:
                    g |= idx[y * w + x] << (2 * j)
            packed.append(0xFF000000 | (g << 8))

    def t_palette(bw):
        bw.put(1, 1)
        bw.put(3, 2)
        bw.put(len(palette) - 1, 8)
        _emit_image_data(bw, _lits(deltas), force_normal=True, sub=True)

    payload = _make_vp8l(w, h, _lits(packed), transforms=[t_palette],
                         force_normal=True)
    dw, dh, rgb = _decode(payload)
    assert (dw, dh) == (w, h)
    want = _rgb_array([palette[i] for i in idx])
    assert np.array_equal(rgb, want)


def test_meta_prefix_two_groups():
    # 8x2 image, meta block bits 2 -> meta image 2x1: left half group 0,
    # right half group 1, with disjoint color sets per group
    w, h = 8, 2
    a, b = _argb(11, 22, 33), _argb(200, 210, 220)
    pixels = [a if x < 4 else b for y in range(h) for x in range(w)]
    payload = _make_vp8l(
        w, h, _lits(pixels),
        meta=(2, 2, [0, 1], 2),
    )
    dw, dh, rgb = _decode(payload)
    assert (dw, dh) == (w, h)
    assert np.array_equal(rgb, _rgb_array(pixels))


def test_decline_paths_fall_back():
    # version != 0
    bw = _W()
    bw.put(3, 14)
    bw.put(1, 14)
    bw.put(0, 1)
    bw.put(5, 3)
    assert decode_vp8l_chunk(b"\x2f" + bw.bytes()) is None
    # over pixel budget
    bw = _W()
    bw.put((1 << 14) - 1, 14)
    bw.put((1 << 14) - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    assert decode_vp8l_chunk(b"\x2f" + bw.bytes()) is None
    # truncated stream
    a = _argb(1, 2, 3)
    payload = _make_vp8l(4, 4, _lits([a] * 16))
    chunk = payload[payload.index(b"VP8L") + 8:]
    assert decode_vp8l_chunk(chunk[: len(chunk) // 2]) is None
    # bad signature
    assert decode_vp8l_chunk(b"\x2e\x00\x00") is None


def test_decode_image_dispatch_real_webp_lossless():
    a, b = _argb(200, 10, 30), _argb(5, 250, 120)
    pixels = [a, b, b, a]
    payload = _make_vp8l(2, 2, _lits(pixels))
    w, h, feat = decode_image(payload)
    assert (w, h) == (2, 2)
    want = _rgb_array(pixels).astype(np.float32) / 255.0
    assert feat[0] == pytest.approx(float(want[:, 0].mean()), abs=1e-6)
    assert feat[1] == pytest.approx(float(want[:, 1].mean()), abs=1e-6)
    assert feat[2] == pytest.approx(float(want[:, 2].mean()), abs=1e-6)


def test_decode_image_vp8x_wrapped_vp8l():
    a = _argb(90, 90, 90)
    pixels = [a] * 4
    bw = _W()
    _header(bw, 2, 2)
    bw.put(0, 1)
    _emit_image_data(bw, _lits(pixels))
    payload = _wrap_riff(bw.bytes(), vp8x=True)
    w, h, feat = decode_image(payload)
    assert (w, h) == (2, 2)
    assert feat[0] == pytest.approx(90 / 255.0, abs=1e-6)


def test_lossy_vp8_still_reports_header_dims():
    # VP8 (lossy) stays a labeled stub with TRUE header dims
    vp8 = (b"RIFF" + struct.pack("<I", 30) + b"WEBP" + b"VP8 "
           + struct.pack("<I", 16) + b"\x00" * 3 + b"\x9d\x01\x2a"
           + struct.pack("<HH", 64, 48) + b"\x00" * 6)
    w, h, _ = decode_image(vp8)
    assert (w, h) == (64, 48)
