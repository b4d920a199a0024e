#!/usr/bin/env python3
"""GIF cross-check harness against the system giflib (via ctypes):
encode deterministic GIFs with the REAL giflib encoder — global/local
palettes of 2/16/256 colors, interlaced and sequential rasters,
transparency (GCE), multi-frame animations — then dump each file's
FIRST frame as deinterlaced RGBA bytes (palette-mapped, transparent
index -> alpha 0) plus the frame count. GifRealStreamSpec decodes the
same .gif files with graft's decoder and compares byte-for-byte.

Usage: python3 tools/gif_crosscheck.py OUTDIR
Manifest lines: <name> <w> <h> <frames> <desc>
"""
import ctypes
import os
import sys

lib = ctypes.CDLL("libgif.so.7")


class GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                ("Blue", ctypes.c_ubyte)]


class ColorMapObject(ctypes.Structure):
    _fields_ = [("ColorCount", ctypes.c_int), ("BitsPerPixel", ctypes.c_int),
                ("SortFlag", ctypes.c_int),
                ("Colors", ctypes.POINTER(GifColorType))]


class GifImageDesc(ctypes.Structure):
    _fields_ = [("Left", ctypes.c_int), ("Top", ctypes.c_int),
                ("Width", ctypes.c_int), ("Height", ctypes.c_int),
                ("Interlace", ctypes.c_int),
                ("ColorMap", ctypes.POINTER(ColorMapObject))]


class ExtensionBlock(ctypes.Structure):
    _fields_ = [("ByteCount", ctypes.c_int),
                ("Bytes", ctypes.POINTER(ctypes.c_ubyte)),
                ("Function", ctypes.c_int)]


class SavedImage(ctypes.Structure):
    _fields_ = [("ImageDesc", GifImageDesc),
                ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.POINTER(ExtensionBlock))]


class GifFileType(ctypes.Structure):
    _fields_ = [("SWidth", ctypes.c_int), ("SHeight", ctypes.c_int),
                ("SColorResolution", ctypes.c_int),
                ("SBackGroundColor", ctypes.c_int),
                ("AspectByte", ctypes.c_ubyte),
                ("SColorMap", ctypes.POINTER(ColorMapObject)),
                ("ImageCount", ctypes.c_int),
                ("Image", GifImageDesc),
                ("SavedImages", ctypes.POINTER(SavedImage)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.POINTER(ExtensionBlock)),
                ("Error", ctypes.c_int),
                ("UserData", ctypes.c_void_p),
                ("Private", ctypes.c_void_p)]


class GCB(ctypes.Structure):
    _fields_ = [("DisposalMode", ctypes.c_int),
                ("UserInputFlag", ctypes.c_int),
                ("DelayTime", ctypes.c_int),
                ("TransparentColor", ctypes.c_int)]


GFP = ctypes.POINTER(GifFileType)
lib.EGifOpenFileName.restype = GFP
lib.EGifOpenFileName.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_int)]
lib.DGifOpenFileName.restype = GFP
lib.DGifOpenFileName.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int)]
lib.GifMakeMapObject.restype = ctypes.POINTER(ColorMapObject)
lib.GifMakeMapObject.argtypes = [ctypes.c_int, ctypes.c_void_p]
lib.EGifPutScreenDesc.argtypes = [GFP, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int,
                                  ctypes.POINTER(ColorMapObject)]
lib.EGifPutImageDesc.argtypes = [GFP, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 ctypes.POINTER(ColorMapObject)]
lib.EGifPutLine.argtypes = [GFP, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
lib.EGifGCBToSavedExtension.argtypes = [ctypes.POINTER(GCB), GFP, ctypes.c_int]
lib.EGifPutExtension.argtypes = [GFP, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_void_p]
lib.DGifSavedExtensionToGCB.argtypes = [GFP, ctypes.c_int,
                                        ctypes.POINTER(GCB)]

INTERLACE_OFFSETS = (0, 4, 2, 1)
INTERLACE_JUMPS = (8, 8, 4, 2)


def interlaced_rows(h):
    rows = []
    for p in range(4):
        y = INTERLACE_OFFSETS[p]
        while y < h:
            rows.append(y)
            y += INTERLACE_JUMPS[p]
    return rows


def make_cmap(n, seed):
    colors = (GifColorType * n)()
    for i in range(n):
        colors[i] = GifColorType((i * 37 + seed) % 256, (i * 59 + 2 * seed) % 256,
                                 (i * 83 + 3 * seed) % 256)
    m = lib.GifMakeMapObject(n, ctypes.cast(colors, ctypes.c_void_p))
    assert m
    return m


def gen(path, w, h, ncol, interlace, trans, frames, seed, local):
    err = ctypes.c_int(0)
    f = lib.EGifOpenFileName(path.encode(), 0, ctypes.byref(err))
    assert f, err.value
    gmap = make_cmap(ncol, seed)
    assert lib.EGifPutScreenDesc(f, w, h, 8, 0, None if local else gmap) == 1
    for fr in range(frames):
        if trans >= 0:
            gcb = GCB(0, 0, 5, trans)
            # write the GCE ahead of the image descriptor
            raw = (ctypes.c_ubyte * 4)()
            # giflib helper: EGifGCBToExtension equivalent via SavedExtension
            # is post-hoc; write the 4 GCE bytes directly
            raw[0] = 0x01 if trans >= 0 else 0  # transparent flag
            raw[1] = 5; raw[2] = 0              # delay LE
            raw[3] = trans
            assert lib.EGifPutExtension(f, 0xF9, 4, raw) == 1
        imap = make_cmap(ncol, seed + 7 * fr) if local else None
        assert lib.EGifPutImageDesc(f, 0, 0, w, h, interlace,
                                    imap if local else None) == 1
        def idx(x, y):
            return (x * 3 + y * 5 + seed + fr) % ncol
        row = (ctypes.c_ubyte * w)()
        ys = interlaced_rows(h) if interlace else range(h)
        for y in ys:
            for x in range(w):
                row[x] = idx(x, y)
            assert lib.EGifPutLine(f, row, w) == 1
    assert lib.EGifCloseFile(f, ctypes.byref(err)) == 1


def dump_first_frame(path, out):
    err = ctypes.c_int(0)
    f = lib.DGifOpenFileName(path.encode(), ctypes.byref(err))
    assert f, err.value
    assert lib.DGifSlurp(f) == 1
    g = f.contents
    img = g.SavedImages[0]
    d = img.ImageDesc
    w, h = d.Width, d.Height
    cmap = d.ColorMap if d.ColorMap else g.SColorMap
    cc = cmap.contents.ColorCount
    colors = cmap.contents.Colors
    gcb = GCB()
    trans = -1
    if lib.DGifSavedExtensionToGCB(f, 0, ctypes.byref(gcb)) == 1:
        trans = gcb.TransparentColor
    # DGifSlurp already DEINTERLACES into RasterBits (screen row order)
    bits = [img.RasterBits[i] for i in range(w * h)]
    buf = bytearray()
    for i in bits:
        assert i < cc
        c = colors[i]
        buf += bytes((c.Red, c.Green, c.Blue, 0 if i == trans else 255))
    with open(out, "wb") as fo:
        fo.write(buf)
    n = g.ImageCount
    lib.DGifCloseFile(f, ctypes.byref(err))
    return w, h, n


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    cases = []
    i = 0
    for (w, h) in [(16, 16), (23, 11), (40, 28)]:
        for (ncol, interlace, trans, frames, local) in [
                (256, 0, -1, 1, 0), (16, 1, 3, 1, 0), (2, 0, 1, 1, 0),
                (64, 1, -1, 1, 1), (256, 0, 7, 3, 0), (16, 0, -1, 2, 1)]:
            name = f"gif_{i}"
            p = os.path.join(outdir, name + ".gif")
            gen(p, w, h, ncol, interlace, trans, frames, 13 + i, local)
            W, H, n = dump_first_frame(p, os.path.join(outdir, name + ".rgba"))
            assert (W, H) == (w, h) and n == frames, (W, H, n)
            cases.append(f"{name} {w} {h} {frames} "
                         f"c{ncol}-i{interlace}-t{trans}-f{frames}-l{local}")
            i += 1
    with open(os.path.join(outdir, "manifest.txt"), "w") as f:
        f.write("\n".join(cases) + "\n")
    print(f"wrote {i} gif cases to {outdir}")


if __name__ == "__main__":
    main()
