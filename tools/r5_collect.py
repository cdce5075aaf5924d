"""Assemble BENCH_SCENES_r5.json from the campaign logs.

Reads artifacts/r5_campaign/*.out (one JSON line each: phase-1 rows
from bench_scenes.py on the r4-end snapshot, phase-2 r3-code controls,
phase-3 r2 TwoSphereCheckers control from tpu_scene_frame.py) and
writes the round-5 scene table with same-day controls attached.
"""

import glob
import json
import os
import sys

LOG = "/root/repo/artifacts/r5_campaign"


def read_rows(pattern):
    rows = {}
    for p in glob.glob(os.path.join(LOG, pattern)):
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                r = json.loads(line)
                name = r["metric"].split()[0]
                rows[name] = r
    return rows


def main():
    r5 = read_rows("r5-*.out")
    r3 = read_rows("r3ctl-*.out")
    r2 = read_rows("r2ctl-*.out")
    r3_hist = {  # BENCH_SCENES_r3.json values (round-3 day)
        "TwoSphereCheckers": 0.762, "LightTest": 6.91, "CornellBox": 12.98,
        "ModelTest": 12.94, "SphereField": 60.33, "TriangleTest": None,
    }
    scenes = []
    for name in ("TwoSphereCheckers", "LightTest", "CornellBox",
                 "TriangleTest", "ModelTest", "SphereField"):
        r = r5.get(name)
        if not r:
            print(f"# MISSING r5 row for {name}", file=sys.stderr)
            continue
        row = {
            "metric": r["metric"],
            "value": round(r["value"], 4),
            "unit": "s",
            "vs_baseline": round(r.get("vs_baseline", 0.0), 3),
            "spread": r.get("spread"),
            "host_load1": r.get("host_load1"),
            "round3": r3_hist[name],
        }
        if name in r3:
            row["r3_control_same_day"] = round(r3[name]["value"], 4)
        if name in r2:
            row["r2_control_same_day"] = round(r2[name]["value"], 4)
        scenes.append(row)
    out = {
        "round": 5,
        "hardware": "v5e 1 chip (axon)",
        "date": "2026-08-20",
        "note": (
            "Full judging-config frames on the round-4-end code "
            "(.wt_r4 snapshot), fetch-bracketed wall clock, "
            "median-of-reps; vs_baseline = achieved rays/s over the "
            "8 Mray/s reference-CPU estimate.  r3_control/r2_control "
            "rows were measured the SAME DAY on the same host from "
            "the .wt_r3/.wt_r2 worktrees (tools/tpu_scene_frame.py) — "
            "the only comparison protocol that survives day-to-day "
            "host variance (~9%).  FINDINGS: (1) the round-4 fused "
            "bounce is 1.9-2.9x on every table-free judged frame "
            "(TwoSphereCheckers 0.423->0.144, CornellBox 12.65->6.63, "
            "TriangleTest 7.64->3.94, LightTest 5.85->2.95 — the "
            "<=5.0 s LightTest target is met with 41% headroom); "
            "(2) the 'TwoSphereCheckers +71% regression' carried "
            "since round 3 NEVER EXISTED: r2 and r3 code measure "
            "0.425/0.423 s on the same day — the recorded 0.762 was "
            "host-day inflation; (3) big scenes are flat (ModelTest "
            "12.91 vs 12.93, SphereField 60.13 vs 59.52) — the v4 "
            "sweep path was untouched in round 4."
        ),
        "scenes": scenes,
    }
    path = "/root/repo/BENCH_SCENES_r5.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
