#!/usr/bin/env python3
"""Split a `DevBench --explain` dump into plans/<round>/<query>_<side>.txt.

Usage: python3 tools/split_plans.py <dumpfile> <outdir> <suffix>

Each section starts at `==== <name> plan ====` and ends at the first
pass/median timing line for that query (the plan text itself).
"""
import re, sys, os

dump, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)
name, buf = None, []

def flush():
    if name and buf:
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write("\n".join(buf).rstrip() + "\n")

for line in open(dump, errors="replace"):
    line = line.rstrip("\n")
    m = re.match(r"==== (\S+) plan ====", line)
    if m:
        flush()
        name, buf = m.group(1), []
        continue
    if name and re.match(r"\S+ (pass \d+:|median:)", line):
        flush()
        name, buf = None, []
        continue
    if name is not None:
        buf.append(line)
flush()
print("wrote", len(os.listdir(outdir)), "files in", outdir)
