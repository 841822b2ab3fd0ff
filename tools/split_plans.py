#!/usr/bin/env python3
"""Split an ExplainMain log into per-query plan files.

usage: split_plans.py <log> <outdir> <suffix> [name ...]
Writes <outdir>/<query>_<suffix>.txt for each ========== <query> ==========
section (restricted to the given names when provided), stripping sbt's
[info]/[error] prefixes.
"""
import re
import sys
import os

log, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
only = set(sys.argv[4:])
os.makedirs(outdir, exist_ok=True)
cur, buf, n = None, [], 0


def flush():
    global n
    if cur and (not only or cur in only) and buf:
        with open(os.path.join(outdir, f"{cur}_{suffix}.txt"), "w") as f:
            f.write("\n".join(buf).rstrip() + "\n")
        n += 1


for line in open(log, errors="replace"):
    line = re.sub(r"^\[(info|error)\] ", "", line.rstrip("\n"))
    m = re.match(r"=+ ([a-z0-9_]+) =+$", line.strip())
    if m:
        flush()
        cur, buf[:] = m.group(1), []
        continue
    # keep only plan-ish lines: skip log4j noise (timestamped) lines
    if re.match(r"^\d\d/\d\d/\d\d ", line) or "log4j" in line:
        continue
    if cur is not None:
        buf.append(line)
flush()
print(f"wrote {n} plan files to {outdir} (suffix {suffix})")
