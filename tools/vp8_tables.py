#!/usr/bin/env python3
"""Recover the RFC 6386 normative VP8 constant tables from the system
libwebp (dev-time tool; the tables are PUBLIC normative constants from
RFC 6386 sections 13.4/13.5/14.1/11.2 — this script just saves
re-typing ~3 KB of spec constants, and the recovered values are then
verified BEHAVIORALLY: graft's Scala decoder must reproduce libwebp's
own bit-exact reconstruction on real lossy streams, see
tools/vp8_crosscheck.py and Vp8RealStreamSpec).

Heuristics used to locate each table in .rodata:
  - default coeff probs [4][8][3][11] and the update probs [4][8][3][11]
    appear in BOTH the decoder and encoder objects -> search for long
    duplicated runs of 1056 bytes; update probs are overwhelmingly 255.
  - kf b-mode probs [10][10][9]: 900 bytes, all in 1..255, duplicated.
  - dequant tables: two ascending uint16[128] runs starting 4,5,6,7...
Outputs a Scala source fragment on stdout.
"""
import sys

PATH = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
data = open(PATH, "rb").read()

# .rodata bounds from readelf (offset 0x5a000; take a generous window)
RO_START, RO_END = 0x5A000, 0x6DD60
ro = data[RO_START:RO_END]

def find_dup_blocks(size):
    """Return offsets of size-byte blocks that appear >= 2 times, all
    bytes nonzero (probabilities are 1..255)."""
    seen = {}
    hits = []
    step = 4
    for off in range(0, len(ro) - size, step):
        blk = ro[off:off + size]
        if 0 in blk:
            continue
        if blk in seen and seen[blk] != -1:
            hits.append((seen[blk], off))
            seen[blk] = -1
        elif blk not in seen:
            seen[blk] = off
    return hits

# --- coeff tables: 1056-byte duplicated all-nonzero runs ---
hits = find_dup_blocks(1056)
cands = []
for a, b in hits:
    blk = ro[a:a + 1056]
    n255 = blk.count(255)
    cands.append((a, n255))
# dedupe overlapping candidates: keep maximal distinct starts
cands.sort()
merged = []
for off, n255 in cands:
    if merged and off - merged[-1][0] < 1056:
        continue
    merged.append((off, n255))
print(f"// coeff-table candidates (offset_in_rodata, count_255): {merged}",
      file=sys.stderr)
if len(merged) < 2:
    sys.exit("need 2 coeff tables")
# update probs = the mostly-255 one; defaults = the other
merged.sort(key=lambda x: -x[1])
upd_off = merged[0][0]
def_off = [m for m in merged if m[0] != upd_off][0][0]
upd = list(ro[upd_off:upd_off + 1056])
dflt = list(ro[def_off:def_off + 1056])

# --- kf b-mode probs: 900-byte duplicated nonzero run ---
hits900 = find_dup_blocks(900)
bm = []
for a, b in hits900:
    # exclude overlap with the coeff tables
    if any(abs(a - o) < 1056 for o in (upd_off, def_off)):
        continue
    bm.append(a)
bm = sorted(set(bm))
# keep maximal distinct
bmode_off = None
prev = -10000
for off in bm:
    if off - prev >= 900:
        bmode_off = bmode_off or off
        prev = off
print(f"// bmode candidates: {bm[:6]} -> chose {bmode_off}", file=sys.stderr)
bmode = list(ro[bmode_off:bmode_off + 900]) if bmode_off is not None else []

# --- dequant tables: ascending uint16[128] starting 4,5,6,7,8 ---
import struct
qt = []
for off in range(0, len(ro) - 256, 2):
    vals = struct.unpack_from("<128H", ro, off)
    if vals[0] == 4 and vals[1] == 5 and vals[2] == 6 and vals[3] == 7:
        if all(vals[i] <= vals[i + 1] for i in range(127)) and vals[-1] > 100:
            qt.append((off, vals))
print(f"// dequant candidates at {[o for o,_ in qt]} "
      f"(last values {[v[-1] for _,v in qt]})", file=sys.stderr)

def scala_arr(name, vals, per=16):
    lines = [f"  val {name}: Array[Int] = Array("]
    for i in range(0, len(vals), per):
        chunk = ", ".join(str(v) for v in vals[i:i + per])
        sep = "," if i + per < len(vals) else ")"
        lines.append(f"    {chunk}{sep}")
    return "\n".join(lines)

print(scala_arr("CoeffUpdateProbs", upd))
print(scala_arr("DefaultCoeffProbs", dflt))
if bmode:
    print(scala_arr("KfBModeProbs", bmode))
for i, (off, vals) in enumerate(qt[:2]):
    print(scala_arr(f"QTable{i}", list(vals)))
