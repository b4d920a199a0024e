#!/usr/bin/env python3
"""Dev/test harness for the graft VP8 decoder: encodes deterministic
test images as REAL lossy WebP with the system libwebp, dumps both the
.webp bytes and libwebp's own YUV reconstruction (VP8 reconstruction is
bit-exact by spec), so the Scala decoder can be verified byte-for-byte
against genuine encoder output (graft.tools.Vp8CrossProbe /
Vp8RealStreamSpec). Deterministic: fixed LCG, no RNG state leaks.

Usage: python3 tools/vp8_crosscheck.py OUTDIR
Writes case_<i>.webp, case_<i>.yuv (Y then U then V, cropped planes)
and manifest.txt lines: <name> <w> <h> <quality>.
"""
import ctypes
import os
import sys

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


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
            elif kind == "flat":
                px[o] = (seed * 37) % 256
                px[o + 1] = (seed * 59) % 256
                px[o + 2] = (seed * 83) % 256
            else:  # blocks: flat 8x8 tiles -> strong edges, skip MBs
                t = ((x // 8) * 31 + (y // 8) * 17 + seed) % 256
                px[o] = t; px[o + 1] = (t * 3) % 256; px[o + 2] = (255 - t)
    return bytes(px)


def encode(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGB(rgb, w, h, w * 3, float(q), ctypes.byref(out))
    if size == 0:
        raise RuntimeError("encode failed")
    data = ctypes.string_at(out, size)
    lib.WebPFree(out)
    return data


def decode_yuv(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    if not y:
        raise RuntimeError("decode failed")
    W, H = w.value, h.value
    cw, chh = (W + 1) // 2, (H + 1) // 2
    yb = bytearray()
    for r in range(H):
        yb += ctypes.string_at(ctypes.addressof(y.contents) + r * stride.value, W)
    ub = bytearray()
    vb = bytearray()
    for r in range(chh):
        ub += ctypes.string_at(ctypes.addressof(u.contents) + r * uv_stride.value, cw)
        vb += ctypes.string_at(ctypes.addressof(v.contents) + r * uv_stride.value, cw)
    lib.WebPFree(y)
    return bytes(yb + ub + vb)


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    cases = []
    sizes = [(16, 16), (32, 32), (48, 32), (17, 13), (64, 64), (80, 48),
             (33, 49), (128, 96)]
    kinds = ["noise", "grad", "flat", "blocks"]
    quals = [10, 30, 50, 75, 90, 95]
    i = 0
    for (w, h) in sizes:
        for kind in kinds:
            q = quals[i % len(quals)]
            rgb = make_rgb(w, h, kind, i + 7)
            data = encode(rgb, w, h, q)
            yuv = decode_yuv(data)
            name = f"case_{i}"
            with open(os.path.join(outdir, name + ".webp"), "wb") as f:
                f.write(data)
            with open(os.path.join(outdir, name + ".yuv"), "wb") as f:
                f.write(yuv)
            cases.append(f"{name} {w} {h} {q}")
            i += 1
    with open(os.path.join(outdir, "manifest.txt"), "w") as f:
        f.write("\n".join(cases) + "\n")
    print(f"wrote {i} cases to {outdir}")


if __name__ == "__main__":
    main()
