#!/usr/bin/env python3
"""Lossless (VP8L) real-stream cross-check: encode images with the
system libwebp in LOSSLESS mode across methods/qualities (real VP8L
streams exercising predictor/cross-color/subtract-green/palette
transforms, meta prefix images, color cache and LZ77), dump the .webp
plus libwebp's decoded RGB, and a manifest for the Scala side
(Vp8RealStreamSpec) to verify graft's VP8L decoder byte-for-byte.

Usage: python3 tools/vp8l_crosscheck.py OUTDIR
Manifest lines: <name> <w> <h> <desc>
"""
import ctypes
import os
import sys
import types

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

# reuse the WebPConfig/WebPPicture ctypes plumbing from the adv harness
_here = os.path.dirname(os.path.abspath(__file__))
_src = open(os.path.join(_here, "vp8_crosscheck_adv.py")).read()
_src = _src.replace('if __name__ == "__main__":\n    main()', "")
_adv = types.ModuleType("adv")
exec(compile(_src, "adv", "exec"), _adv.__dict__)


def lcg(seed):
    s = seed & 0xFFFFFFFF
    while True:
        s = (s * 1664525 + 1013904223) & 0xFFFFFFFF
        yield (s >> 16) & 0xFF


def make_rgb(w, h, kind, seed):
    g = lcg(seed)
    px = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            o = (y * w + x) * 3
            if kind == "noise":
                px[o] = next(g); px[o + 1] = next(g); px[o + 2] = next(g)
            elif kind == "grad":
                px[o] = (x * 4 + seed) % 256
                px[o + 1] = (y * 3 + 2 * seed) % 256
                px[o + 2] = (x + y + 3 * seed) % 256
            elif kind == "pal2":  # 2 colors -> 1-bit palette bundling
                t = 255 if (x // 3 + y // 2) % 2 == 0 else 0
                px[o] = t; px[o + 1] = 255 - t; px[o + 2] = t
            elif kind == "pal7":  # 7 colors -> 2-bit-ish bundling
                t = ((x // 2) * 3 + y * 5 + seed) % 7
                px[o] = t * 36; px[o + 1] = (t * 17) % 256; px[o + 2] = 255 - t * 20
            elif kind == "pal200":  # many colors -> unbundled palette
                t = (x * 7 + y * 11 + seed) % 200
                px[o] = t; px[o + 1] = (t * 3) % 256; px[o + 2] = (t * 5) % 256
            else:  # photo-ish: smooth + texture -> predictor/cross-color
                px[o] = (x * 2 + y + next(g) % 7 + seed) % 256
                px[o + 1] = (x + y * 2 + next(g) % 5) % 256
                px[o + 2] = ((x * x) // 16 + y * 3 + next(g) % 3) % 256
    return bytes(px)


def decode_rgb(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p
    raw = ctypes.string_at(p, w.value * h.value * 4)
    lib.WebPFree(p)
    rgb = bytearray()
    for i in range(0, len(raw), 4):
        rgb += raw[i:i + 3]
    return bytes(rgb), w.value, h.value


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    cases = []
    i = 0
    sizes = [(8, 8), (17, 13), (32, 32), (64, 48), (120, 80), (200, 150)]
    kinds = ["noise", "grad", "pal2", "pal7", "pal200", "photo"]
    for mi, method in enumerate((0, 2, 4, 6)):
        for si, (w, h) in enumerate(sizes):
            kind = kinds[(mi + si) % len(kinds)]
            q = (30, 60, 90, 100)[(mi + si) % 4]
            rgb = make_rgb(w, h, kind, 17 + i)
            data = _adv.encode_adv(rgb, w, h, lossless=1, quality=float(q),
                                   method=method, exact=1)
            got, W, H = decode_rgb(data)
            assert (W, H) == (w, h)
            name = f"vp8l_{i}"
            with open(os.path.join(outdir, name + ".webp"), "wb") as f:
                f.write(data)
            with open(os.path.join(outdir, name + ".rgb"), "wb") as f:
                f.write(got)
            cases.append(f"{name} {w} {h} {kind}-m{method}-q{q}")
            i += 1
    with open(os.path.join(outdir, "manifest.txt"), "w") as f:
        f.write("\n".join(cases) + "\n")
    print(f"wrote {i} lossless cases to {outdir}")


if __name__ == "__main__":
    main()
