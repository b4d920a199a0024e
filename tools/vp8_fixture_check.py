#!/usr/bin/env python3
"""Reverse cross-check: decode graft-encoded VP8 fixture streams
(written by graft.tools.Vp8FixtureProbe) through the system libwebp and
compare its Y/U/V planes against graft's own decode. Proves the fixture
encoder writes genuine VP8 bitstreams.

Usage: python3 tools/vp8_fixture_check.py DIR
"""
import ctypes
import os
import sys

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)


def decode_yuv(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    if not y:
        return None, 0, 0
    W, H = w.value, h.value
    cw, chh = (W + 1) // 2, (H + 1) // 2
    out = bytearray()
    for r in range(H):
        out += ctypes.string_at(ctypes.addressof(y.contents) + r * stride.value, W)
    for plane in (u, v):
        for r in range(chh):
            out += ctypes.string_at(
                ctypes.addressof(plane.contents) + r * uv_stride.value, cw)
    lib.WebPFree(y)
    return bytes(out), W, H


def main():
    d = sys.argv[1]
    fails = 0
    n = 0
    for line in open(os.path.join(d, "manifest.txt")):
        line = line.strip()
        if not line:
            continue
        name, w, h = line.split()
        data = open(os.path.join(d, name + ".webp"), "rb").read()
        want = open(os.path.join(d, name + ".yuv"), "rb").read()
        got, W, H = decode_yuv(data)
        n += 1
        if got is None:
            print(f"FAIL {name}: libwebp refused the stream")
            fails += 1
        elif (W, H) != (int(w), int(h)):
            print(f"FAIL {name}: dims {W}x{H} want {w}x{h}")
            fails += 1
        elif got != want:
            diff = next(i for i in range(len(got)) if got[i] != want[i])
            print(f"FAIL {name}: first diff at {diff} "
                  f"libwebp={got[diff]} graft={want[diff]}")
            fails += 1
    print(f"checked {n}, fails {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
