#!/usr/bin/env python3
"""Alpha-channel cross-check: encode RGBA images as real lossy WebP
with the system libwebp (default lossless alpha), dump the .webp plus
libwebp's own decoded ALPHA plane (from WebPDecodeRGBA — the A bytes
are exact since alpha_quality defaults to 100), and a manifest noting
each case's ALPH compression method so the Scala side can assert
decode for raw-compressed alpha and the documented scope error for
VP8L-transform-compressed alpha.

Usage: python3 tools/vp8_alpha_check.py OUTDIR
Manifest lines: <name> <w> <h> <alph_compression>
"""
import ctypes
import os
import sys

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def lcg(seed):
    s = seed & 0xFFFFFFFF
    while True:
        s = (s * 1664525 + 1013904223) & 0xFFFFFFFF
        yield (s >> 16) & 0xFF


def make_rgba(w, h, kind, seed):
    g = lcg(seed)
    px = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            o = (y * w + x) * 4
            px[o] = (x * 3 + seed) % 256
            px[o + 1] = (y * 5 + 2 * seed) % 256
            px[o + 2] = (x + y) % 256
            if kind == "noise":
                px[o + 3] = next(g)
            elif kind == "mixnoise":
                px[o + 3] = (128 + next(g) // 2) % 256
            else:  # grad — tends to compress as VP8L (scope-error case)
                px[o + 3] = (x * 2 + y * 3 + seed) % 256
    return bytes(px)


def alph_compression(data):
    off = 12
    while off + 8 <= len(data):
        t = data[off:off + 4]
        ln = int.from_bytes(data[off + 4:off + 8], "little")
        if t == b"ALPH":
            return data[off + 8] & 3
        off += 8 + ln + (ln & 1)
    return -1


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    cases = []
    i = 0
    for (w, h) in [(16, 16), (32, 32), (48, 32), (17, 13), (80, 48), (64, 64)]:
        for kind in ("noise", "mixnoise", "grad"):
            rgba = make_rgba(w, h, kind, 31 + i)
            out = ctypes.POINTER(ctypes.c_uint8)()
            size = lib.WebPEncodeRGBA(rgba, w, h, w * 4, 75.0,
                                      ctypes.byref(out))
            assert size > 0
            data = ctypes.string_at(out, size)
            lib.WebPFree(out)
            comp = alph_compression(data)
            ww = ctypes.c_int(); hh = ctypes.c_int()
            dec = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(ww),
                                     ctypes.byref(hh))
            assert dec and (ww.value, hh.value) == (w, h)
            raw = ctypes.string_at(dec, w * h * 4)
            lib.WebPFree(dec)
            alpha = bytes(raw[3::4])
            name = f"alpha_{i}"
            with open(os.path.join(outdir, name + ".webp"), "wb") as f:
                f.write(data)
            with open(os.path.join(outdir, name + ".alpha"), "wb") as f:
                f.write(alpha)
            cases.append(f"{name} {w} {h} {comp}")
            i += 1
    with open(os.path.join(outdir, "manifest.txt"), "w") as f:
        f.write("\n".join(cases) + "\n")
    print(f"wrote {i} alpha cases to {outdir}")


if __name__ == "__main__":
    main()
