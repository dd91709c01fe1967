#!/usr/bin/env python3
"""Split ExplainAudit stdout (===== name ===== sections) into per-query
plan files for the plans/r15 before/after deliverable.

Usage: split_plans.py <audit_dump> <outdir> <suffix> [name ...]
Writes <outdir>/<name>_<suffix>.txt for each requested name (all
sections if no names given)."""
import sys, os, re

dump, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
names = set(sys.argv[4:])
os.makedirs(outdir, exist_ok=True)
text = open(dump, errors="replace").read()
parts = re.split(r"^=+ (\S+) =+$", text, flags=re.M)
# parts = [prefix, name1, body1, name2, body2, ...]
n = 0
for i in range(1, len(parts) - 1, 2):
    name, body = parts[i], parts[i + 1]
    if names and name not in names:
        continue
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(body.strip() + "\n")
    n += 1
print(f"wrote {n} plan files to {outdir}")
