#!/usr/bin/env python3
"""Drive tools/jpeg_harness.c (real libjpeg) to build a JPEG
cross-check corpus: encode a matrix of synthetic images across
quality, gray/color, baseline/progressive, restart intervals, 4:2:0 vs
4:4:4 subsampling and optimized-vs-default Huffman tables, then dump
each stream's QUANTIZED coefficients via jpeg_read_coefficients. The
Scala side (JpegRealStreamSpec / graft.tools.JpegCrossProbe) decodes
the same .jpg files with graft's entropy layer and compares the
coefficient planes byte-for-byte.

Usage: python3 tools/jpeg_crosscheck.py OUTDIR
Manifest lines: <name> <desc>
"""
import os
import subprocess
import sys

here = os.path.dirname(os.path.abspath(__file__))
src = os.path.join(here, "jpeg_harness.c")


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    exe = os.path.join(outdir, "jpeg_harness")
    subprocess.run(["gcc", "-O2", "-o", exe, src, "-ljpeg"], check=True)
    cases = []
    i = 0
    sizes = [(16, 16), (48, 32), (17, 13), (64, 48), (120, 80), (33, 49)]
    kinds = ["noise", "grad", "blocks", "photo"]
    for prog in ("base", "prog"):
        for color in ("gray", "color"):
            for ri, restart in enumerate((0, 1, 2, 5)):
                w, h = sizes[(ri + (0 if prog == "base" else 2)
                              + (0 if color == "gray" else 3)) % len(sizes)]
                kind = kinds[i % 4]
                q = (25, 50, 75, 92)[(i + 1) % 4]
                sub = "420" if (i % 2 == 0 and color == "color") else "444"
                name = f"jpg_{i}"
                jpg = os.path.join(outdir, name + ".jpg")
                subprocess.run([exe, "gen", jpg, str(w), str(h), kind,
                                str(7 + i), str(q), color, prog,
                                str(restart), sub], check=True)
                subprocess.run([exe, "coef", jpg,
                                os.path.join(outdir, name + ".bin")],
                               check=True)
                cases.append(f"{name} {color}-{prog}-q{q}-r{restart}-{sub}-{kind}-{w}x{h}")
                i += 1
    with open(os.path.join(outdir, "manifest.txt"), "w") as f:
        f.write("\n".join(cases) + "\n")
    print(f"wrote {i} jpeg cases to {outdir}")


if __name__ == "__main__":
    main()
