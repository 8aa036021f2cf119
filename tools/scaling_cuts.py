"""Recompute every scaling-evidence cut in BASELINE.md from the raw
committed artifacts (scaling/*_scaling_*.json) — the honest table's
numbers are generated, not hand-tallied.

Reading = ``weak_seq_efficiency`` (fixed work per cpu: the 50 k-page
8-cpu phase's crawl seconds over the 200 k-page 32-cpu phase's; 1.0 =
perfect weak scaling).  Its two phases are instrumented since r4b/r4g:

  md5 cpu probe   probe_sec_8cpu_quarter / probe_sec_32cpu   (cal ~0.315 s)
  memcpy probe    mem_probe_sec_8cpu_quarter / mem_probe_sec_32cpu (cal ~0.35 s)
  hypervisor steal steal_frac_8cpu / steal_frac_32cpu

Validity rule (pre-registered, outcome-blind): a reading is
  steal+probe-valid  iff both steals < 5 % and both weak_seq md5
                     probes within ~20 % of calibration (<= 0.385 s);
  fully-valid        iff additionally both weak_seq memcpy probes
                     within ~20 % of calibration (<= 0.425 s).
Readings missing an instrument can't qualify for its cut.

Usage: python tools/scaling_cuts.py [scaling_dir]
"""

import glob
import json
import os
import re
import statistics
import sys

MD5_CAL_MAX = 0.385   # ~0.315 s quiet + ~20 %
MEM_CAL_MAX = 0.425   # ~0.35 s quiet + ~20 %
STEAL_MAX = 0.05

# campaigns whose scripts enforced the settle gate (wait for 1-min
# load < 0.8, later + a full-width steal burst) before every run
GATED = ("r3i", "r3j", "r3k", "r4b", "r4c", "r4d", "r4e", "r4f",
         "r4g", "r4h", "r4i", "r4j", "r4k", "r4l", "r4m", "r4n", "r4o",
         "r4q", "r4s", "r5a", "r5c", "r5d")


def classify(j):
    """Return (steal_probe_valid, fully_valid, why)."""
    need_sp = ("steal_frac_8cpu", "steal_frac_32cpu",
               "probe_sec_8cpu_quarter", "probe_sec_32cpu")
    if any(k not in j for k in need_sp):
        return False, False, "uninstrumented"
    bad = []
    if j["steal_frac_8cpu"] >= STEAL_MAX:
        bad.append(f"steal8={j['steal_frac_8cpu']:.3f}")
    if j["steal_frac_32cpu"] >= STEAL_MAX:
        bad.append(f"steal32={j['steal_frac_32cpu']:.3f}")
    if j["probe_sec_8cpu_quarter"] > MD5_CAL_MAX:
        bad.append(f"md5q={j['probe_sec_8cpu_quarter']:.3f}")
    if j["probe_sec_32cpu"] > MD5_CAL_MAX:
        bad.append(f"md5_32={j['probe_sec_32cpu']:.3f}")
    sp = not bad
    need_f = ("mem_probe_sec_8cpu_quarter", "mem_probe_sec_32cpu")
    if any(k not in j for k in need_f):
        return sp, False, ";".join(bad) or "no mem probe"
    fbad = list(bad)
    if j["mem_probe_sec_8cpu_quarter"] > MEM_CAL_MAX:
        fbad.append(f"memq={j['mem_probe_sec_8cpu_quarter']:.3f}")
    if j["mem_probe_sec_32cpu"] > MEM_CAL_MAX:
        fbad.append(f"mem32={j['mem_probe_sec_32cpu']:.3f}")
    return sp, not fbad, ";".join(fbad) or "clean"


def main():
    sdir = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scaling")
    rows = []
    for p in sorted(glob.glob(os.path.join(sdir, "*_scaling_*.json"))):
        m = re.match(r"(.+)_scaling_(\d+)\.json$", os.path.basename(p))
        try:
            j = json.load(open(p))
        except Exception:
            continue
        v = j.get("weak_seq_efficiency")
        if v is None:
            continue
        sp, fv, why = classify(j)
        rows.append({"campaign": m.group(1), "run": int(m.group(2)),
                     "reading": v, "gated": m.group(1) in GATED,
                     "sp_valid": sp, "fully_valid": fv, "why": why,
                     "node_proxy": j.get("weak_efficiency")})

    def cut(name, sel):
        vals = sorted(r["reading"] for r in rows if sel(r))
        med = statistics.median(vals) if vals else float("nan")
        print(f"{name:44s} n={len(vals):3d} median={med:.3f}")
        return vals

    for r in rows:
        mark = ("FULL" if r["fully_valid"]
                else "S+P " if r["sp_valid"] else "    ")
        print(f"  {r['campaign']:>4s}/{r['run']} {r['reading']:6.3f} "
              f"{mark} gated={int(r['gated'])} [{r['why']}]")
    print()
    cut("ALL committed readings, no selection", lambda r: True)
    cut("settle-gated campaigns, no selection",
        lambda r: r["gated"])
    cut("in-artifact steal+probe valid", lambda r: r["sp_valid"])
    cut("FULLY instrumented valid (steal+md5+mem)",
        lambda r: r["fully_valid"])


if __name__ == "__main__":
    main()
