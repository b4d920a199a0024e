#!/usr/bin/env python3
"""Drive tools/png_harness.c (real libpng) to build the PNG cross-check
corpus: every color type at each legal bit depth, non-interlaced and
Adam7, with and without tRNS, then dump libpng's canonical RGBA8
expansion per stream. PngRealStreamSpec decodes the same .png files
with graft's decoder and compares planes byte-for-byte.

Usage: python3 tools/png_crosscheck.py OUTDIR
Manifest lines: <name> <w> <h> <desc>
"""
import os
import subprocess
import sys

here = os.path.dirname(os.path.abspath(__file__))


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    exe = os.path.join(outdir, "png_harness")
    subprocess.run(["gcc", "-O2", "-o", exe,
                    os.path.join(here, "png_harness.c"), "-lpng"], check=True)
    combos = []  # (ct, depth)
    for d in (1, 2, 4, 8, 16):
        combos.append((0, d))
    for d in (8, 16):
        combos.append((2, d))
        combos.append((4, d))
        combos.append((6, d))
    for d in (1, 2, 4, 8):
        combos.append((3, d))
    sizes = [(16, 16), (17, 13), (40, 28), (9, 31)]
    cases = []
    i = 0
    for (ct, depth) in combos:
        for interlace in (0, 1):
            w, h = sizes[i % len(sizes)]
            trns = 1 if (ct in (0, 2, 3) and i % 2 == 0) else 0
            name = f"png_{i}"
            png = os.path.join(outdir, name + ".png")
            subprocess.run([exe, "gen", png, str(w), str(h), str(ct),
                            str(depth), str(interlace), str(11 + i),
                            str(trns)], check=True)
            subprocess.run([exe, "rgba", png,
                            os.path.join(outdir, name + ".rgba")], check=True)
            cases.append(f"{name} {w} {h} ct{ct}-d{depth}-i{interlace}-t{trns}")
            i += 1
    with open(os.path.join(outdir, "manifest.txt"), "w") as f:
        f.write("\n".join(cases) + "\n")
    print(f"wrote {i} png cases to {outdir}")


if __name__ == "__main__":
    main()
