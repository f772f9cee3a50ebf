#!/usr/bin/env python3
"""Per-query bench delta: committed-baseline bench_out.json (a git rev)
vs the working-tree bench_out.json. Prints the summary numbers and the
|delta| >= threshold mover table in PERF_DELTA.md's format."""
import json
import subprocess
import sys

rev = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 0.35

old = json.loads(subprocess.check_output(["git", "show", f"{rev}:bench_out.json"]))
new = json.load(open("bench_out.json"))
oq, nq = old["queries"], new["queries"]
shared = sorted(set(oq) & set(nq))
added = sorted(set(nq) - set(oq))
so, sn = sum(oq[q] for q in shared), sum(nq[q] for q in shared)
print(f"old total {old['value']:.1f}s / {len(oq)} queries; "
      f"new total {new['value']:.1f}s / {len(nq)} queries")
print(f"shared {len(shared)}: {so:.1f}s -> {sn:.1f}s "
      f"({100 * (sn - so) / so:+.1f}%)")
print(f"new queries ({len(added)}): "
      f"{sum(nq[q] for q in added):.1f}s total")
for q in added:
    print(f"  {q}: {nq[q]:.2f}s")
print(f"\nmovers |d| >= {thresh}s (spread = this run's min–max over its "
      f"passes, ratio = spread/median — >0.5 means the delta is "
      f"interference-suspect, not plan drift):")
nsp, osp = new.get("spread", {}), old.get("spread", {})
movers = sorted(shared, key=lambda q: -abs(nq[q] - oq[q]))
for q in movers:
    d = nq[q] - oq[q]
    if abs(d) < thresh:
        break
    mn, mx = nsp.get(q, [nq[q], nq[q]])
    ratio = (mx - mn) / nq[q] if nq[q] > 0 else 0.0
    stab = " (stabilized)" if q in new.get("stabilized", []) else ""
    print(f"| {q} | {oq[q]:.2f} | {nq[q]:.2f} | {d:+.2f} | "
          f"{mn:.2f}–{mx:.2f} ({ratio:.2f}){stab} | |")
sp = new.get("scale_probe", {})
bad = {k: v for k, v in sp.items()
       if isinstance(v, dict) and v.get("per_row_ratio", 0) > 1.0}
print(f"\nscale_probe arms > 1.0 per-row: {bad or 'none'}")
print(f"hll_profile_max_err: {new.get('hll_profile_max_err')}")
print(f"failed: {new.get('failed')}")
