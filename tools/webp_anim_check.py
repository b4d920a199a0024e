#!/usr/bin/env python3
"""Animated-WebP cross-check harness. libwebpdemux is NOT in this
container, so there is no turnkey animation decoder to diff against;
instead this pins the two halves separately with what IS available:

  1. per-frame PIXEL truth from libwebp: every frame payload is a real
     libwebp encode (lossless RGBA or lossy RGB), decoded back through
     WebPDecodeRGBA — graft's still decoders are already proven
     bit-exact against these streams;
  2. container/compositing truth from this INDEPENDENT Python
     assembler + compositor: the ANMF/ANIM/VP8X container is assembled
     here (not by the Scala encoder under test) and expected canvases
     are composited per the container spec — canvas starts
     transparent, blend flag alpha-blends vs overwrites, dispose flag
     fills the frame rect with the ANIM background color. The integer
     blend formula (da2 = da*(255-sa)//255; ao = sa+da2;
     c = (cs*sa+cd*da2)//ao) is documented in Webp.scala; binary-alpha
     (0/255) frames are exact under ANY conformant blender.

Usage: python3 tools/webp_anim_check.py OUTDIR
Manifest: <name> <w> <h> <nframes> <bg_argb_hex> <loop> <desc>
Files:    <name>.webp, <name>.f<K>.rgba (canvas RGBA per frame)
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

_here = os.path.dirname(os.path.abspath(__file__))
_src = open(os.path.join(_here, "vp8_crosscheck_adv.py")).read()
_src = _src.replace('if __name__ == "__main__":\n    main()', "")
_adv = types.ModuleType("adv")
exec(compile(_src, "adv", "exec"), _adv.__dict__)


def encode_lossless_rgba(rgba, w, h):
    """Real libwebp lossless+exact encode of an RGBA buffer."""
    cfg = _adv.WebPConfig()
    assert lib.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(75.0), _adv.ABI) == 1
    cfg.lossless = 1
    cfg.exact = 1
    cfg.method = 4
    assert lib.WebPValidateConfig(ctypes.byref(cfg)) == 1
    pic = _adv.WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), _adv.ABI) == 1
    pic.width = w
    pic.height = h
    pic.use_argb = 1
    assert lib.WebPPictureImportRGBA(ctypes.byref(pic), rgba, w * 4) == 1
    wr = _adv.WebPMemoryWriter()
    lib.WebPMemoryWriterInit(ctypes.byref(wr))
    lib.WebPMemoryWrite.restype = ctypes.c_int
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, _adv.WRITER_FN)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    lib.WebPPictureFree(ctypes.byref(pic))
    assert ok == 1, pic.error_code
    data = ctypes.string_at(wr.mem, wr.size)
    lib.WebPMemoryWriterClear(ctypes.byref(wr))
    return data


def decode_rgba(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p
    raw = bytes(ctypes.string_at(p, w.value * h.value * 4))
    lib.WebPFree(p)
    return raw, w.value, h.value


def is_lossy(still):
    o = 12
    while o + 8 <= len(still):
        tag = still[o:o + 4]
        ln = int.from_bytes(still[o + 4:o + 8], "little")
        if tag == b"VP8 ":
            return True
        if tag == b"VP8L":
            return False
        o += 8 + ln + (ln & 1)
    raise AssertionError("no image chunk")


def frame_rgba(still):
    """Per-frame pixel truth. Lossless: libwebp's RGBA directly. Lossy
    VP8: libwebp's NORMATIVE YUV reconstruction converted with the same
    documented BT.601 fixed-point + box-upsampling path as Vp8.toRgb —
    the YUV->RGB step is not normative in VP8, and graft's color path
    is the repo-wide documented one (cross-checked on YUV planes by
    vp8_crosscheck*.py)."""
    if not is_lossy(still):
        return decode_rgba(still)
    _, w, h = decode_rgba(still)
    yuv = _adv.decode_yuv(still)
    cw, chh = (w + 1) // 2, (h + 1) // 2
    yp = yuv[:w * h]
    up = yuv[w * h:w * h + cw * chh]
    vp = yuv[w * h + cw * chh:]
    px = bytearray(w * h * 4)
    for yy in range(h):
        for xx in range(w):
            lum = yp[yy * w + xx]
            ci = (yy // 2) * cw + (xx // 2)
            cb = up[ci] - 128
            cr = vp[ci] - 128
            def cl(v0):
                return 0 if v0 < 0 else (255 if v0 > 255 else v0)
            o = (yy * w + xx) * 4
            px[o] = cl(lum + ((91881 * cr + 32768) >> 16))
            px[o + 1] = cl(lum - ((22554 * cb + 46802 * cr + 32768) >> 16))
            px[o + 2] = cl(lum + ((116130 * cb + 32768) >> 16))
            px[o + 3] = 255
    return bytes(px), w, h


# ---------------------------------------------------------------------
# container assembly (independent of the Scala encoder under test)
# ---------------------------------------------------------------------
def _u24(v):
    return bytes((v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff))


def _u32(v):
    return bytes((v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff,
                  (v >> 24) & 0xff))


def _chunk(tag, payload):
    out = tag.encode() + _u32(len(payload)) + payload
    if len(payload) & 1:
        out += b"\0"
    return out


def assemble(canvas_w, canvas_h, bg_argb, loop, frames):
    """frames: list of (x, y, dur, blend, dispose, still_webp_bytes)."""
    body = _chunk("VP8X", bytes((0x02, 0, 0, 0)) +
                  _u24(canvas_w - 1) + _u24(canvas_h - 1))
    bg = bytes((bg_argb & 0xff, (bg_argb >> 8) & 0xff,
                (bg_argb >> 16) & 0xff, (bg_argb >> 24) & 0xff))  # B,G,R,A
    body += _chunk("ANIM", bg + bytes((loop & 0xff, (loop >> 8) & 0xff)))
    for (fx, fy, dur, blend, dispose, still) in frames:
        assert fx % 2 == 0 and fy % 2 == 0
        # lift ALPH/VP8/VP8L chunks out of the still container
        inner = b""
        o = 12
        w = h = -1
        while o + 8 <= len(still):
            tag = still[o:o + 4].decode("ascii", "replace")
            ln = int.from_bytes(still[o + 4:o + 8], "little")
            if tag in ("ALPH", "VP8 ", "VP8L"):
                inner += still[o:o + 8 + ln + (ln & 1)]
            o += 8 + ln + (ln & 1)
        _, w, h = decode_rgba(still)[0], *decode_rgba(still)[1:]
        flags = (0 if blend else 0x02) | (0x01 if dispose else 0)
        anmf = (_u24(fx // 2) + _u24(fy // 2) + _u24(w - 1) + _u24(h - 1) +
                _u24(dur) + bytes((flags,)) + inner)
        body += _chunk("ANMF", anmf)
    return b"RIFF" + _u32(4 + len(body)) + b"WEBP" + body


def composite(canvas_w, canvas_h, bg_argb, frames, frame_px):
    """Expected canvases per spec; frame_px[k] = (rgba_bytes, w, h)."""
    canvas = [(0, 0, 0, 0)] * (canvas_w * canvas_h)
    outs = []
    for k, (fx, fy, dur, blend, dispose, _) in enumerate(frames):
        rgba, w, h = frame_px[k]
        for yy in range(h):
            for xx in range(w):
                o = (yy * w + xx) * 4
                sr, sg, sb, sa = rgba[o], rgba[o + 1], rgba[o + 2], rgba[o + 3]
                at = (fy + yy) * canvas_w + fx + xx
                if not blend or sa == 255:
                    canvas[at] = (sr, sg, sb, sa)
                elif sa == 0:
                    pass
                else:
                    dr, dg, db, da = canvas[at]
                    da2 = da * (255 - sa) // 255
                    ao = sa + da2
                    if ao == 0:
                        canvas[at] = (0, 0, 0, 0)
                    else:
                        canvas[at] = ((sr * sa + dr * da2) // ao,
                                      (sg * sa + dg * da2) // ao,
                                      (sb * sa + db * da2) // ao, ao)
        outs.append(b"".join(bytes(p) for p in canvas))
        if dispose:
            bgpx = ((bg_argb >> 16) & 0xff, (bg_argb >> 8) & 0xff,
                    bg_argb & 0xff, (bg_argb >> 24) & 0xff)
            for yy in range(h):
                for xx in range(w):
                    canvas[(fy + yy) * canvas_w + fx + xx] = bgpx
    return outs


def make_rgba(w, h, seed, alpha_kind):
    px = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            o = (y * w + x) * 4
            px[o] = (x * 7 + y * 3 + seed) % 256
            px[o + 1] = (x * 5 + y * 11 + 2 * seed) % 256
            px[o + 2] = (x * 13 + y + 3 * seed) % 256
            if alpha_kind == "opaque":
                px[o + 3] = 255
            elif alpha_kind == "binary":
                px[o + 3] = 255 if (x + y + seed) % 3 else 0
            else:  # fractional
                px[o + 3] = (x * 29 + y * 17 + seed * 7) % 256
    return bytes(px)


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    cases = []
    idx = 0

    def emit(name, cw, ch, bg, loop, frames, desc):
        nonlocal idx
        data = assemble(cw, ch, bg, loop, frames)
        frame_px = [frame_rgba(f[5]) for f in frames]
        canvases = composite(cw, ch, bg, frames, frame_px)
        with open(os.path.join(outdir, name + ".webp"), "wb") as f:
            f.write(data)
        for k, cv in enumerate(canvases):
            with open(os.path.join(outdir, f"{name}.f{k}.rgba"), "wb") as f:
                f.write(cv)
        cases.append(f"{name} {cw} {ch} {len(frames)} {bg:08x} {loop} {desc}")
        idx += 1

    cw, ch = 40, 30
    base = encode_lossless_rgba(make_rgba(cw, ch, 3, "opaque"), cw, ch)
    small_b = encode_lossless_rgba(make_rgba(16, 12, 9, "binary"), 16, 12)
    small_o = encode_lossless_rgba(make_rgba(16, 12, 5, "opaque"), 16, 12)
    small_f = encode_lossless_rgba(make_rgba(16, 12, 7, "frac"), 16, 12)
    lossy = _adv.encode_adv(
        bytes(make_rgba(24, 16, 11, "opaque")[i]
              for i in range(24 * 16 * 4) if i % 4 != 3), 24, 16,
        lossless=0, quality=75.0, method=4)

    # 1: binary-alpha blend over an opaque base + no-blend overwrite
    emit("anim_0", cw, ch, 0x00000000, 0, [
        (0, 0, 40, True, False, base),
        (4, 2, 40, True, False, small_b),   # blend: holes show base
        (20, 14, 40, False, False, small_b) # overwrite: holes go transparent
    ], "blend-vs-overwrite")

    # 2: dispose-to-background with a NONZERO background color
    emit("anim_1", cw, ch, 0xff336699, 2, [
        (0, 0, 30, True, False, base),
        (8, 8, 30, True, True, small_o),    # disposed to bg after snapshot
        (0, 16, 30, True, False, small_o)
    ], "dispose-nonzero-bg")

    # 3: dispose to TRANSPARENT background + partial first frame
    emit("anim_2", cw, ch, 0x00000000, 1, [
        (2, 2, 25, True, False, small_o),
        (12, 10, 25, True, True, small_o),
        (24, 18, 25, True, False, small_b)
    ], "dispose-transparent-partial-base")

    # 4: a real LOSSY VP8 frame among lossless ones
    emit("anim_3", cw, ch, 0x00000000, 0, [
        (0, 0, 50, True, False, base),
        (8, 6, 50, True, False, lossy),
        (2, 2, 50, True, False, small_b)
    ], "lossy-vp8-frame")

    # 5: fractional alpha (documented integer formula, both sides)
    emit("anim_4", cw, ch, 0x00000000, 3, [
        (0, 0, 20, True, False, base),
        (10, 8, 20, True, False, small_f),
        (10, 8, 20, True, False, small_f)
    ], "fractional-alpha-formula")

    with open(os.path.join(outdir, "manifest.txt"), "w") as f:
        f.write("\n".join(cases) + "\n")
    print(f"wrote {idx} animated webp cases to {outdir}")


if __name__ == "__main__":
    main()
