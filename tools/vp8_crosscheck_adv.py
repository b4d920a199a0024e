#!/usr/bin/env python3
"""Advanced-API companion to vp8_crosscheck.py: drives WebPEncode with
explicit WebPConfig fields so the decoder's less-traveled paths get
real-encoder coverage — the SIMPLE loop filter, sharpness levels,
multiple token partitions, 1..4 segments, autofilter, extreme
qualities and tiny/partial-MB sizes.

The WebPConfig/WebPPicture ABI version is brute-forced against
WebPConfigInitInternal (returns 0 on mismatch), so this fails loudly
rather than corrupting memory if the system libwebp changes.

Usage: python3 tools/vp8_crosscheck_adv.py OUTDIR
"""
import ctypes
import os
import sys

lib = ctypes.CDLL("libwebp.so.7")


class WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int)]


class WebPMemoryWriter(ctypes.Structure):
    _fields_ = [("mem", ctypes.POINTER(ctypes.c_uint8)),
                ("size", ctypes.c_size_t), ("max_size", ctypes.c_size_t),
                ("pad", ctypes.c_uint32 * 1)]


WRITER_FN = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                             ctypes.c_size_t, ctypes.c_void_p)


class WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.c_void_p), ("u", ctypes.c_void_p), ("v", ctypes.c_void_p),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", WRITER_FN), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int), ("extra_info", ctypes.c_void_p),
        ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3), ("pad4", ctypes.c_void_p),
        ("pad5", ctypes.c_void_p), ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2)]


def find_abi():
    for v in range(0x0200, 0x0300):
        cfg = WebPConfig()
        if lib.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(75.0), v) == 1:
            return v
    raise SystemExit("no WebPConfig ABI version matched")


ABI = find_abi()


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
            else:  # mix
                t = ((x // 4) * 13 + (y // 4) * 7 + seed) % 256
                px[o] = (t + next(g) // 8) % 256
                px[o + 1] = t
                px[o + 2] = (x * 2 + y) % 256
    return bytes(px)


def encode_adv(rgb, w, h, **fields):
    cfg = WebPConfig()
    assert lib.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(75.0), ABI) == 1
    for k, val in fields.items():
        setattr(cfg, k, type(getattr(cfg, k))(val) if k == "quality" else val)
    assert lib.WebPValidateConfig(ctypes.byref(cfg)) == 1, fields

    pic = WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), ABI) == 1
    pic.width = w
    pic.height = h
    pic.use_argb = 1
    assert lib.WebPPictureImportRGB(ctypes.byref(pic), rgb, w * 3) == 1

    wr = WebPMemoryWriter()
    lib.WebPMemoryWriterInit(ctypes.byref(wr))
    lib.WebPMemoryWrite.restype = ctypes.c_int
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, WRITER_FN)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    lib.WebPPictureFree(ctypes.byref(pic))
    if ok != 1:
        raise RuntimeError(f"encode failed: {fields} err={pic.error_code}")
    data = ctypes.string_at(wr.mem, wr.size)
    lib.WebPMemoryWriterClear(ctypes.byref(wr))
    return data


def decode_yuv(data):
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
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
    out = bytearray()
    for r in range(H):
        out += ctypes.string_at(ctypes.addressof(y.contents) + r * stride.value, W)
    for plane in (u, v):
        for r in range(chh):
            out += ctypes.string_at(
                ctypes.addressof(plane.contents) + r * uv_stride.value, cw)
    lib.WebPFree(y)
    return bytes(out)


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    cases = []
    variants = [
        dict(quality=50.0, filter_type=0, filter_strength=60),   # simple LF
        dict(quality=20.0, filter_type=0, filter_strength=100),
        dict(quality=50.0, filter_type=1, filter_sharpness=3),
        dict(quality=35.0, filter_type=1, filter_sharpness=7),
        dict(quality=60.0, partitions=2),                        # 4 partitions
        dict(quality=60.0, partitions=3),                        # 8 partitions
        dict(quality=45.0, segments=1),
        dict(quality=45.0, segments=2),
        dict(quality=70.0, segments=4, sns_strength=100),
        dict(quality=80.0, autofilter=1),
        dict(quality=0.0),
        dict(quality=100.0),
        dict(quality=100.0, qmin=0, qmax=10),                    # near-lossless q
        dict(quality=55.0, filter_strength=0),                   # LF off
        dict(quality=65.0, method=0),
        dict(quality=65.0, method=6),
    ]
    sizes = [(1, 1), (3, 5), (15, 16), (16, 8), (129, 65), (160, 112)]
    kinds = ["noise", "grad", "mix"]
    i = 0
    for vi, fields in enumerate(variants):
        for si, (w, h) in enumerate(sizes):
            if (vi + si) % 2 == 1 and w * h > 256:
                continue  # keep the matrix affordable
            kind = kinds[(vi + si) % 3]
            rgb = make_rgb(w, h, kind, 101 + i)
            data = encode_adv(rgb, w, h, **fields)
            yuv = decode_yuv(data)
            name = f"adv_{i}"
            with open(os.path.join(outdir, name + ".webp"), "wb") as f:
                f.write(data)
            with open(os.path.join(outdir, name + ".yuv"), "wb") as f:
                f.write(yuv)
            desc = ",".join(f"{k}={v}" for k, v in fields.items())
            cases.append(f"{name} {w} {h} {desc}")
            i += 1
    with open(os.path.join(outdir, "manifest.txt"), "w") as f:
        f.write("\n".join(cases) + "\n")
    print(f"abi=0x{ABI:x}; wrote {i} cases to {outdir}")


if __name__ == "__main__":
    main()
