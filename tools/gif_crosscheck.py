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


def gen_anim(path, sw, sh, frames, seed):
    """Write a multi-frame animation with the REAL giflib encoder.
    Each frame is a dict: left, top, w, h, ncol, local, interlace,
    trans (index or -1), disposal (0-3), fno (pixel formula variant)."""
    err = ctypes.c_int(0)
    f = lib.EGifOpenFileName(path.encode(), 0, ctypes.byref(err))
    assert f, err.value
    gmap = make_cmap(max(fr["ncol"] for fr in frames), seed)
    assert lib.EGifPutScreenDesc(f, sw, sh, 8, 0, gmap) == 1
    for k, fr in enumerate(frames):
        raw = (ctypes.c_ubyte * 4)()
        raw[0] = (fr["disposal"] << 2) | (0x01 if fr["trans"] >= 0 else 0)
        raw[1] = 5; raw[2] = 0  # delay LE
        raw[3] = fr["trans"] if fr["trans"] >= 0 else 0
        assert lib.EGifPutExtension(f, 0xF9, 4, raw) == 1
        imap = make_cmap(fr["ncol"], seed + 11 * k) if fr["local"] else None
        assert lib.EGifPutImageDesc(f, fr["left"], fr["top"], fr["w"],
                                    fr["h"], fr["interlace"], imap) == 1
        fno = fr["fno"]
        def idx(x, y):
            return (x * (3 + fno) + y * (5 + 2 * fno) + seed + 7 * k) % fr["ncol"]
        row = (ctypes.c_ubyte * fr["w"])()
        ys = interlaced_rows(fr["h"]) if fr["interlace"] else range(fr["h"])
        for y in ys:
            for x in range(fr["w"]):
                row[x] = idx(x, y)
            assert lib.EGifPutLine(f, row, fr["w"]) == 1
    assert lib.EGifCloseFile(f, ctypes.byref(err)) == 1


def dump_frames(path, outdir, name):
    """Composite EVERY frame per GIF89a disposal semantics onto the
    logical screen — canvas starts transparent; transparent-index
    pixels leave it unchanged; disposal 2 clears the frame rect back
    to transparent (modern-renderer rule, LSD background ignored);
    disposal 3 restores the pre-frame canvas — and dump each
    composited canvas as <name>.f<k>.rgba. giflib supplies the
    independently decoded rasters (DGifSlurp deinterlaces) and GCBs."""
    err = ctypes.c_int(0)
    f = lib.DGifOpenFileName(path.encode(), ctypes.byref(err))
    assert f, err.value
    assert lib.DGifSlurp(f) == 1
    g = f.contents
    sw, sh = g.SWidth, g.SHeight
    canvas = [(0, 0, 0, 0)] * (sw * sh)
    for k in range(g.ImageCount):
        img = g.SavedImages[k]
        d = img.ImageDesc
        cmap = d.ColorMap if d.ColorMap else g.SColorMap
        cc = cmap.contents.ColorCount
        colors = cmap.contents.Colors
        gcb = GCB()
        disposal, trans = 0, -1
        if lib.DGifSavedExtensionToGCB(f, k, ctypes.byref(gcb)) == 1:
            disposal, trans = gcb.DisposalMode, gcb.TransparentColor
        saved = list(canvas) if disposal == 3 else None
        for fy in range(d.Height):
            for fx in range(d.Width):
                i = img.RasterBits[fy * d.Width + fx]
                assert i < cc
                if i != trans:
                    c = colors[i]
                    canvas[(d.Top + fy) * sw + d.Left + fx] = \
                        (c.Red, c.Green, c.Blue, 255)
        buf = bytearray()
        for px in canvas:
            buf += bytes(px)
        with open(os.path.join(outdir, f"{name}.f{k}.rgba"), "wb") as fo:
            fo.write(buf)
        if disposal == 2:
            for fy in range(d.Height):
                for fx in range(d.Width):
                    canvas[(d.Top + fy) * sw + d.Left + fx] = (0, 0, 0, 0)
        elif disposal == 3:
            canvas = saved
    n = g.ImageCount
    lib.DGifCloseFile(f, ctypes.byref(err))
    return sw, sh, n


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

    # --- multi-frame animation cases: every disposal mode, offsets,
    # transparency, local palettes, interlaced later frames ---
    def F(left, top, w, h, ncol=16, local=0, interlace=0, trans=-1,
          disposal=0, fno=0):
        return dict(left=left, top=top, w=w, h=h, ncol=ncol, local=local,
                    interlace=interlace, trans=trans, disposal=disposal,
                    fno=fno)

    anim_cases = []
    a = 0
    for (sw, sh) in [(20, 14), (33, 25)]:
        qw, qh = sw // 2, sh // 2
        scenarios = [
            # keep-chain: full-canvas frames overwrite each other
            ("keep", [F(0, 0, sw, sh, ncol=64, disposal=1, fno=0),
                      F(0, 0, sw, sh, ncol=64, disposal=1, fno=1),
                      F(0, 0, sw, sh, ncol=64, disposal=1, fno=2)]),
            # transparency over a base: offset frames punch through
            ("trans", [F(0, 0, sw, sh, ncol=16, disposal=1),
                       F(2, 1, qw, qh, ncol=16, trans=3, disposal=1, fno=1),
                       F(qw, qh, qw, qh, ncol=16, trans=5, disposal=1, fno=2)]),
            # restore-to-background leaves a transparent hole
            ("bg", [F(0, 0, sw, sh, ncol=16, disposal=1),
                    F(1, 2, qw, qh, ncol=16, disposal=2, fno=1),
                    F(sw - qw, sh - qh, qw, qh, ncol=16, disposal=0, fno=2)]),
            # restore-to-previous reverts the middle frame entirely
            ("prev", [F(0, 0, sw, sh, ncol=16, disposal=1),
                      F(3, 3, qw, qh, ncol=16, disposal=3, fno=1),
                      F(0, 0, qw, qh, ncol=16, disposal=1, fno=2)]),
            # local palettes + an interlaced later frame + partial first
            # frame (transparent canvas border)
            ("mixed", [F(2, 2, sw - 4, sh - 4, ncol=32, local=1, disposal=1),
                       F(0, 0, sw, sh - 1, ncol=32, local=1, interlace=1,
                         trans=7, disposal=3, fno=1),
                       F(1, 1, qw, qh, ncol=32, local=1, disposal=2, fno=2),
                       F(0, 0, sw, sh, ncol=32, interlace=1, disposal=1,
                         fno=3)]),
        ]
        for tag, frames in scenarios:
            name = f"anim_{a}"
            p = os.path.join(outdir, name + ".gif")
            gen_anim(p, sw, sh, frames, 31 + a)
            W, H, n = dump_frames(p, outdir, name)
            assert (W, H, n) == (sw, sh, len(frames)), (W, H, n)
            anim_cases.append(f"{name} {sw} {sh} {len(frames)} {tag}")
            a += 1
    with open(os.path.join(outdir, "manifest_frames.txt"), "w") as f:
        f.write("\n".join(anim_cases) + "\n")
    print(f"wrote {i} gif cases + {a} animation cases to {outdir}")


if __name__ == "__main__":
    main()
