"""Real VP8L (WebP lossless) pixel decoder — stdlib + numpy only.

Implements the VP8L bitstream per RFC 9649 §3-5: LSB-first bit reading,
simple and normal (code-length-coded) canonical prefix codes, the
green/red/blue/alpha/distance five-code group, LZ77 backward references
with the short-distance neighbor map, the optional color cache, meta
prefix-code (entropy image) selection, and all four transforms applied
inverse in reverse read order — predictor (14 modes), cross-channel
color transform, subtract-green, and color indexing with sub-byte pixel
bundling.

Conformance notes, stated honestly because this container ships no
image library or real-world .webp corpus to golden-test against:

- Canonical code assignment, the code-length code (order
  ``_CLC_ORDER``, repeat ops 16/17/18, the max-symbol early-out) and the
  prefix-coded length/distance values follow the RFC pseudo-code
  exactly; they are exercised end-to-end by the hand-built encoder in
  tests/test_vp8l.py (the same strategy the JPEG decoder's tests use).
- The 120-entry short-distance neighbor map is generated from the
  documented ordering rule (neighbors (x, y), y ≥ 0, sorted by
  x²+y², then nearer row first, then smaller |x|, positive x before
  negative); the first 34 entries are pinned against the RFC's listed
  prefix by a unit test.
- A trivial one-symbol prefix code consumes zero bits per decode (the
  libwebp behavior for both the simple form and a degenerate normal
  form); every other code must be Kraft-complete or the decode declines.
- Like the sibling JPEG/PNG decoders, everything is budgeted
  (``MAX_PIXELS``) and exception-safe: any malformed stream returns
  None and the caller falls back to the labeled deterministic stub.

Reference parity note: the Java reference (cc/CCGetter.java) only ever
sniffs image payloads; real pixel decode exceeds parity and exists for
the multimodal feature-extraction operators.
"""

from __future__ import annotations

import numpy as np

MAX_PIXELS = 1 << 20

_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _build_distance_map() -> list[tuple[int, int]]:
    """The 120 short-distance codes are EXACTLY the neighbor offsets
    x ∈ [-7, 8], y ∈ [0, 7] with (y > 0 or x > 0) — the spec table's
    byte encoding ((y << 4) | (8 - x), one nibble each) admits no other
    range, and that range has exactly 120 members, so the table is the
    full candidate set, not a truncation. Order: ascending x²+y²,
    nearer row (larger y) first within a distance, then smaller |x|,
    positive x before negative — this reproduces the spec table's
    listed prefix (pinned through entry 66 by the unit test)."""
    cand = [
        (x, y)
        for y in range(8)
        for x in range(-7, 9)
        if y > 0 or x > 0
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], abs(p[0]), p[0] < 0))
    assert len(cand) == 120
    return cand


_DIST_MAP = _build_distance_map()


class _Bits:
    """LSB-first bit reader over the VP8L stream (RFC 9649 §3.2)."""

    __slots__ = ("data", "n", "byte_pos", "val", "bits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.n = len(data)
        self.byte_pos = 0
        self.val = 0
        self.bits = 0

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        while self.bits < nbits:
            if self.byte_pos >= self.n:
                raise ValueError("vp8l: out of bits")
            self.val |= self.data[self.byte_pos] << self.bits
            self.byte_pos += 1
            self.bits += 8
        v = self.val & ((1 << nbits) - 1)
        self.val >>= nbits
        self.bits -= nbits
        return v


class _Huff:
    """Canonical prefix code: DEFLATE-style assignment (sorted by
    (length, symbol), codes increasing), decoded by an MSB-first walk
    over per-length first-code/count tables. One-symbol codes are
    trivial (zero bits per decode); anything else must be complete."""

    __slots__ = ("single", "syms", "first", "count", "offset", "max_len")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("vp8l: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        self.single = None
        nz.sort()
        max_len = nz[-1][0]
        count = [0] * (max_len + 1)
        for l, _ in nz:
            count[l] += 1
        if sum(c << (max_len - l) for l, c in enumerate(count)) != 1 << max_len:
            raise ValueError("vp8l: incomplete prefix code")
        self.syms = [s for _, s in nz]
        self.first = [0] * (max_len + 1)
        self.count = count
        self.offset = [0] * (max_len + 1)
        code = idx = 0
        for l in range(1, max_len + 1):
            self.first[l] = code
            self.offset[l] = idx
            idx += count[l]
            code = (code + count[l]) << 1
        self.max_len = max_len

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            d = code - self.first[l]
            if 0 <= d < self.count[l]:
                return self.syms[self.offset[l] + d]
        raise ValueError("vp8l: bad prefix code")


def _read_code(br: _Bits, alphabet: int) -> _Huff:
    lengths = [0] * alphabet
    if br.read(1):  # simple code: 1 or 2 symbols stored directly
        num_symbols = br.read(1) + 1
        s0 = br.read(8) if br.read(1) else br.read(1)
        if s0 >= alphabet:
            raise ValueError("vp8l: simple symbol out of range")
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet or s1 == s0:
                raise ValueError("vp8l: bad simple pair")
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1  # trivial — _Huff reads zero bits for it
        return _Huff(lengths)
    # normal: code-length-coded lengths
    n = 4 + br.read(4)
    clc = [0] * 19
    for i in range(n):
        clc[_CLC_ORDER[i]] = br.read(3)
    clc_tree = _Huff(clc)
    if br.read(1):  # explicit cap on the number of symbol-read ops
        nbits = 2 + 2 * br.read(3)
        max_ops = 2 + br.read(nbits)
    else:
        max_ops = alphabet + (alphabet >> 1) + 16  # never binding
    symbol = 0
    prev = 8
    while symbol < alphabet and max_ops > 0:
        max_ops -= 1
        cl = clc_tree.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev = cl
        else:
            if cl == 16:
                rep, v = 3 + br.read(2), prev
            elif cl == 17:
                rep, v = 3 + br.read(3), 0
            else:
                rep, v = 11 + br.read(7), 0
            if symbol + rep > alphabet:
                raise ValueError("vp8l: code-length repeat overflow")
            for _ in range(rep):
                lengths[symbol] = v
                symbol += 1
    return _Huff(lengths)


def _prefix_value(code: int, br: _Bits) -> int:
    """Length/distance prefix decode (RFC 9649 §4.2.1.1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_pixels(br: _Bits, w: int, h: int, top_level: bool) -> list[int]:
    """The spatially-coded ARGB image: color cache info, optional meta
    prefix codes (top level only), prefix-code groups, LZ77 data."""
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError("vp8l: over pixel budget")
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("vp8l: bad color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = meta_w = 0
    n_groups = 1
    if top_level and br.read(1):
        meta_bits = br.read(3) + 2
        meta_w = (w + (1 << meta_bits) - 1) >> meta_bits
        meta_h = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _decode_pixels(br, meta_w, meta_h, top_level=False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]
        n_groups = max(meta) + 1

    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_code(br, 256 + 24 + cache_size),  # green+length+cache
                _read_code(br, 256),  # red
                _read_code(br, 256),  # blue
                _read_code(br, 256),  # alpha
                _read_code(br, 40),  # distance
            )
        )

    npx = w * h
    out = [0] * npx
    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    grp = groups[0]
    while pos < npx:
        if meta is not None:
            x, y = pos % w, pos // w
            grp = groups[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        s = grp[0].decode(br)
        if s < 256:
            red = grp[1].decode(br)
            blue = grp[2].decode(br)
            alpha = grp[3].decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache_size:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dist = _prefix_value(grp[4].decode(br), br)
            if dist > 120:
                dist -= 120
            else:
                dx, dy = _DIST_MAP[dist - 1]
                dist = max(1, dx + dy * w)
            if dist > pos or pos + length > npx:
                raise ValueError("vp8l: bad backward reference")
            if cache_size:
                for _ in range(length):
                    px = out[pos - dist]
                    out[pos] = px
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
                    pos += 1
            else:
                for _ in range(length):
                    out[pos] = out[pos - dist]
                    pos += 1
        else:
            out[pos] = cache[s - 280]  # hit re-hashes to the same slot
            pos += 1
    return out


def _decode_entropy_image(br: _Bits, w: int, h: int) -> list[int]:
    """Sub-resolution helper image (predictor data, color transform
    data, palette): no transforms, no meta codes."""
    return _decode_pixels(br, w, h, top_level=False)


# -- inverse transforms (vectorized where data flow allows) ---------------


def _split(a: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    return (a >> 24) & 0xFF, (a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF


def _join(al: np.ndarray, r: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (
        (al.astype(np.uint32) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    )


def _inv_subtract_green(a: np.ndarray) -> np.ndarray:
    al, r, g, b = _split(a)
    return _join(al, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _inv_color_transform(a: np.ndarray, w: int, h: int, sb: int, data: list[int]) -> np.ndarray:
    bw = (w + (1 << sb) - 1) >> sb
    cte = np.asarray(data, dtype=np.uint32).reshape(-1, bw)
    # expand block grid to pixel grid
    rows = np.repeat(cte, 1 << sb, axis=0)[:h]
    full = np.repeat(rows, 1 << sb, axis=1)[:, :w]
    # packing (encoder-side MakeTransform): red ch = red_to_blue,
    # green ch = green_to_blue, blue ch = green_to_red
    r2b = ((full >> 16) & 0xFF).astype(np.int8).astype(np.int32)
    g2b = ((full >> 8) & 0xFF).astype(np.int8).astype(np.int32)
    g2r = (full & 0xFF).astype(np.int8).astype(np.int32)
    img = a.reshape(h, w)
    al, r, g, b = _split(img)
    gi = g.astype(np.uint8).astype(np.int8).astype(np.int32)
    r = (r + ((g2r * gi) >> 5)) & 0xFF
    ri = r.astype(np.uint8).astype(np.int8).astype(np.int32)
    b = (b + ((g2b * gi) >> 5) + ((r2b * ri) >> 5)) & 0xFF
    return _join(al, r, g, b).reshape(-1)


def _inv_palette(a: np.ndarray, out_w: int, h: int, wb: int, palette: list[int]) -> np.ndarray:
    pal = np.asarray(palette + [0], dtype=np.uint32)  # sentinel: OOR -> 0
    npal = len(palette)
    if wb == 0:
        idx = (a >> 8) & 0xFF
    else:
        per = 1 << wb  # pixels bundled per packed green byte
        bits = 8 >> wb
        packed_w = (out_w + per - 1) >> wb
        g = ((a >> 8) & 0xFF).reshape(h, packed_w).astype(np.uint32)
        shifts = np.arange(per, dtype=np.uint32) * bits
        idx = ((g[:, :, None] >> shifts[None, None, :]) & ((1 << bits) - 1)).reshape(
            h, packed_w * per
        )[:, :out_w]
    idx = np.minimum(idx, npal)  # out-of-range index -> sentinel (0x0)
    return pal[idx].reshape(-1)


def _avg2(p: int, q: int) -> int:
    return (((p ^ q) & 0xFEFEFEFE) >> 1) + (p & q)


def _inv_predictor(a: np.ndarray, w: int, h: int, sb: int, data: list[int]) -> np.ndarray:
    bw = (w + (1 << sb) - 1) >> sb
    modes = [((p >> 8) & 0xFF) for p in data]
    px = a.astype(np.int64).tolist()  # residuals; reconstruct in place

    def clamp_add_sub_full(l: int, t: int, tl: int) -> int:
        out = 0
        for sh in (0, 8, 16, 24):
            v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
            out |= (0 if v < 0 else 255 if v > 255 else v) << sh
        return out

    def clamp_add_sub_half(l: int, t: int, tl: int) -> int:
        av = _avg2(l, t)
        out = 0
        for sh in (0, 8, 16, 24):
            ac = (av >> sh) & 0xFF
            d = ac - ((tl >> sh) & 0xFF)
            # C-style truncation toward zero, not Python floor division
            v = ac + (d // 2 if d >= 0 else -((-d) // 2))
            out |= (0 if v < 0 else 255 if v > 255 else v) << sh
        return out

    def select(t: int, l: int, tl: int) -> int:
        s = 0
        for sh in (0, 8, 16, 24):
            s += abs(((l >> sh) & 0xFF) - ((tl >> sh) & 0xFF)) - abs(
                ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
            )
        return t if s <= 0 else l

    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = px[pos - 1]  # forced L on the top row
        elif x == 0:
            pred = px[pos - w]  # forced T on the left column
        else:
            mode = modes[(y >> sb) * bw + (x >> sb)]
            left = px[pos - 1]
            top = px[pos - w]
            tl = px[pos - w - 1]
            # pos-w+1 at x==w-1 is the current row's first pixel — the
            # contiguous-buffer wrap the format specifies
            tr = px[pos - w + 1]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(left, tr), top)
            elif mode == 6:
                pred = _avg2(left, tl)
            elif mode == 7:
                pred = _avg2(left, top)
            elif mode == 8:
                pred = _avg2(tl, top)
            elif mode == 9:
                pred = _avg2(top, tr)
            elif mode == 10:
                pred = _avg2(_avg2(left, tl), _avg2(top, tr))
            elif mode == 11:
                pred = select(top, left, tl)
            elif mode == 12:
                pred = clamp_add_sub_full(left, top, tl)
            elif mode == 13:
                pred = clamp_add_sub_half(left, top, tl)
            else:
                raise ValueError("vp8l: bad predictor mode")
            # per-channel byte add of the residual
        r = px[pos]
        px[pos] = (
            (((r >> 24) + (pred >> 24)) & 0xFF) << 24
            | (((r >> 16) + (pred >> 16)) & 0xFF) << 16
            | (((r >> 8) + (pred >> 8)) & 0xFF) << 8
            | ((r + pred) & 0xFF)
        )
    return np.asarray(px, dtype=np.uint32)


def decode_vp8l_chunk(chunk: bytes) -> tuple[int, int, np.ndarray] | None:
    """VP8L chunk payload (starting at the 0x2F signature byte) →
    (width, height, (n,3) uint8 RGB pixels), or None when the stream is
    not decodable (caller falls back to header dims / stub)."""
    try:
        if not chunk or chunk[0] != 0x2F:
            return None
        br = _Bits(chunk[1:])
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read(1)  # alpha-is-used hint
        if br.read(3) != 0:  # version must be 0
            return None
        if w * h > MAX_PIXELS:
            return None

        transforms = []  # (kind, size_bits, data, out_width)
        cur_w = w
        seen = set()
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(t)
            if t == 0 or t == 1:  # predictor / color transform
                sb = br.read(3) + 2
                bw = (cur_w + (1 << sb) - 1) >> sb
                bh = (h + (1 << sb) - 1) >> sb
                data = _decode_entropy_image(br, bw, bh)
                transforms.append(("pred" if t == 0 else "color", sb, data, cur_w))
            elif t == 2:
                transforms.append(("subgreen", 0, None, cur_w))
            else:  # color indexing
                psize = br.read(8) + 1
                deltas = _decode_entropy_image(br, psize, 1)
                pal, acc = [], 0
                for d in deltas:  # component-wise cumulative sum mod 256
                    acc = (
                        (((acc >> 24) + (d >> 24)) & 0xFF) << 24
                        | (((acc >> 16) + (d >> 16)) & 0xFF) << 16
                        | (((acc >> 8) + (d >> 8)) & 0xFF) << 8
                        | ((acc + d) & 0xFF)
                    )
                    pal.append(acc)
                wb = 3 if psize <= 2 else 2 if psize <= 4 else 1 if psize <= 16 else 0
                transforms.append(("palette", wb, pal, cur_w))
                cur_w = (cur_w + (1 << wb) - 1) >> wb

        a = np.asarray(_decode_pixels(br, cur_w, h, top_level=True), dtype=np.uint32)
        for kind, sb, data, out_w in reversed(transforms):
            if kind == "palette":
                a = _inv_palette(a, out_w, h, sb, data)
            elif kind == "subgreen":
                a = _inv_subtract_green(a)
            elif kind == "color":
                a = _inv_color_transform(a, out_w, h, sb, data)
            else:
                a = _inv_predictor(a, out_w, h, sb, data)

        rgb = np.stack(
            [(a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF], axis=1
        ).astype(np.uint8)
        return w, h, rgb
    except (ValueError, IndexError, OverflowError):
        return None
