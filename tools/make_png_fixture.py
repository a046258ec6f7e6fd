#!/usr/bin/env python3
"""Generate the committed PNG fixture for the pure-JVM PNG decoder spec.

fixtures/sample.png: an 8-bit RGB PNG written with the stdlib only (zlib +
struct) whose rows cycle through ALL five scanline filters (None/Sub/Up/
Average/Paeth) plus an ancillary tEXt chunk the decoder must skip.
fixtures/sample.rgb: the same pixels raw, for a bit-exact compare.
"""
import os, struct, zlib

W, H, CH = 41, 23, 3  # odd sizes catch stride off-by-ones


def paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def main():
    os.makedirs("fixtures", exist_ok=True)
    # deterministic pixel pattern with enough structure that every filter
    # produces distinct filtered bytes
    px = bytearray(W * H * CH)
    for i in range(len(px)):
        px[i] = (i * 7 + (i // (W * CH)) * 13) % 256

    stride = W * CH
    raw = bytearray()
    for y in range(H):
        f = y % 5
        raw.append(f)
        for x in range(stride):
            cur = px[y * stride + x]
            a = px[y * stride + x - CH] if x >= CH else 0
            b = px[(y - 1) * stride + x] if y > 0 else 0
            c = px[(y - 1) * stride + x - CH] if y > 0 and x >= CH else 0
            if f == 0:
                v = cur
            elif f == 1:
                v = cur - a
            elif f == 2:
                v = cur - b
            elif f == 3:
                v = cur - ((a + b) >> 1)
            else:
                v = cur - paeth(a, b, c)
            raw.append(v % 256)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data +
                struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    png = b"\x89PNG\r\n\x1a\n"
    png += chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0))
    png += chunk(b"tEXt", b"Comment\x00graft fixture")  # must be skipped
    body = zlib.compress(bytes(raw), 6)
    # split IDAT in two: decoders must concatenate multiple IDAT chunks
    png += chunk(b"IDAT", body[: len(body) // 2])
    png += chunk(b"IDAT", body[len(body) // 2:])
    png += chunk(b"IEND", b"")

    with open("fixtures/sample.png", "wb") as f:
        f.write(png)
    with open("fixtures/sample.rgb", "wb") as f:
        f.write(bytes(px))
    print(f"wrote fixtures/sample.png ({len(png)} bytes) + sample.rgb ({len(px)} bytes)")


if __name__ == "__main__":
    main()
