#!/usr/bin/env python3
"""Generate the committed GeoTIFF fixture for the j6b ingestion query.

fixtures/dem50x60.tif: 50 rows x 60 cols, uint16 little-endian, LZW
compressed, rowsPerStrip=8, value = (3*row + 5*col + 7) % 97,
ModelPixelScale (0.01, 0.01), ModelTiepoint (0,0) -> (-74.3, 41.0) —
the same grid the j6 synthetic raster covers, so the oracle can
regenerate the raster from the formula.

Self-checks: the LZW stream is decoded back with a mirror of the Scala
decoder (MSB-first, clear=256, EOI=257, early-change widths) before the
file is written.
"""
import struct, sys, os

W, H, RPS = 60, 50, 8


def pixels():
    out = []
    for r in range(H):
        for c in range(W):
            out.append((3 * r + 5 * c + 7) % 97)
    return out


def lzw_encode(data: bytes) -> bytes:
    """TIFF LZW. The code WIDTH schedule simulates the DECODER's dictionary
    (which runs one entry behind the encoder's): the decoder adds an entry on
    every data code after the first-since-clear, and bumps width (early
    change) when its next-free index hits 2^width - 1. Tracking dec_free
    keeps both sides bit-synchronized."""
    bits = []  # (code, width)
    state = {"width": 9, "dec_free": 258, "first": True}

    def emit(code):
        bits.append((code, state["width"]))

    def emit_data(code):
        emit(code)
        if state["first"]:
            state["first"] = False
        else:
            state["dec_free"] += 1
            if state["dec_free"] == (1 << state["width"]) - 1 and state["width"] < 12:
                state["width"] += 1

    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    emit(256)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit_data(table[w])
        table[wc] = nxt
        nxt += 1
        w = bytes([ch])
        if nxt == 4094:  # keep clear margin; reset dictionary
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            state.update(width=9, dec_free=258, first=True)
    if w:
        emit_data(table[w])
    emit(257)
    # pack MSB-first
    buf = bytearray()
    acc, nacc = 0, 0
    for code, cw in bits:
        acc = (acc << cw) | code
        nacc += cw
        while nacc >= 8:
            nacc -= 8
            buf.append((acc >> nacc) & 0xFF)
    if nacc:
        buf.append((acc << (8 - nacc)) & 0xFF)
    return bytes(buf)


def lzw_decode(data: bytes, expected: int) -> bytes:
    """Mirror of graft.sources.GeoTiff.lzwDecode."""
    out = bytearray()
    dict_ = {}
    dict_size = 258
    width = 9
    bitpos = 0

    def next_code():
        nonlocal bitpos
        if (bitpos + width + 7) // 8 > len(data):
            return 257
        v, taken = 0, 0
        while taken < width:
            bi, off = (bitpos + taken) // 8, (bitpos + taken) % 8
            avail = min(8 - off, width - taken)
            chunk = (data[bi] >> (8 - off - avail)) & ((1 << avail) - 1)
            v = (v << avail) | chunk
            taken += avail
        bitpos += width
        return v

    prev = None
    code = next_code()
    while code != 257 and len(out) < expected:
        if code == 256:
            dict_size, width, prev = 258, 9, None
        else:
            if code < 256:
                entry = bytes([code])
            elif code in dict_:
                entry = dict_[code]
            else:
                entry = prev + prev[:1]
            out.extend(entry)
            if prev is not None and dict_size < 4096:
                dict_[dict_size] = prev + entry[:1]
                dict_size += 1
            if dict_size == (1 << width) - 1 and width < 12:
                width += 1
            prev = entry
        code = next_code()
    return bytes(out)


def main():
    os.makedirs("fixtures", exist_ok=True)
    px = pixels()
    strips = []
    for s0 in range(0, H, RPS):
        rows = px[s0 * W:(s0 + RPS) * W]
        raw = b"".join(struct.pack("<H", v) for v in rows)
        comp = lzw_encode(raw)
        assert lzw_decode(comp, len(raw)) == raw, f"LZW round-trip failed at strip {s0}"
        strips.append(comp)

    n_strips = len(strips)
    # Layout: header(8) | IFD | doubles(scale 24 + tiepoint 48) | strip arrays | strips
    tags = 13
    ifd_size = 2 + tags * 12 + 4
    off_doubles = 8 + ifd_size
    off_scale, off_tie = off_doubles, off_doubles + 24
    off_soff = off_tie + 48              # strip offsets array (LONG each)
    off_sbc = off_soff + 4 * n_strips    # strip byte counts array
    off_data = off_sbc + 4 * n_strips
    offsets = []
    pos = off_data
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    def tag(t, tp, cnt, val):
        return struct.pack("<HHI", t, tp, cnt) + struct.pack("<I", val)

    def short_tag(t, v):
        # SHORT value sits in the upper... little-endian: low 2 bytes of the field
        return struct.pack("<HHI", t, 3, 1) + struct.pack("<HH", v, 0)

    entries = b"".join([                        # ascending tag order (TIFF spec)
        short_tag(256, W),
        short_tag(257, H),
        short_tag(258, 16),
        short_tag(259, 5),                      # LZW
        short_tag(262, 1),                      # BlackIsZero
        tag(273, 4, n_strips, off_soff),        # StripOffsets
        short_tag(277, 1),
        short_tag(278, RPS),
        tag(279, 4, n_strips, off_sbc),         # StripByteCounts
        short_tag(284, 1),                      # PlanarConfiguration chunky
        short_tag(339, 1),                      # unsigned int samples
        tag(33550, 12, 3, off_scale),           # ModelPixelScale
        tag(33922, 12, 6, off_tie),             # ModelTiepoint
    ])
    assert len(entries) == tags * 12
    ifd = struct.pack("<H", tags) + entries + struct.pack("<I", 0)
    blob = bytearray()
    blob += b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
    blob += ifd
    blob += struct.pack("<3d", 0.01, 0.01, 0.0)
    blob += struct.pack("<6d", 0.0, 0.0, 0.0, -74.3, 41.0, 0.0)
    blob += b"".join(struct.pack("<I", o) for o in offsets)
    blob += b"".join(struct.pack("<I", len(s)) for s in strips)
    for s in strips:
        blob += s
    with open("fixtures/dem50x60.tif", "wb") as f:
        f.write(bytes(blob))
    print(f"wrote fixtures/dem50x60.tif ({len(blob)} bytes, {n_strips} strips)")


if __name__ == "__main__":
    main()
