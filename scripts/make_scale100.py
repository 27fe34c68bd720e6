#!/usr/bin/env python3
"""Assemble SCALE100_r10.json from the two probe legs (test tooling only).

Reads the 10x (scale_sf1) and 100x (scale_sf10) Bench subset artifacts,
takes min-rep per row (warm min for incremental rows), computes the
100x/10x ratio against 10x data, and writes the committed artifact with a
one-line curve verdict per row. Pass the leg files and output:

  python3 scripts/make_scale100.py /tmp/probe_10x.json /tmp/probe_100x.json \
      SCALE100_r10.json [extra_10x.json ...]

Extra 10x legs (e.g. a quiet re-run after a contended first leg) are
folded in by taking the MIN per row across legs — the conservative
direction: a lower 10x denominator makes the reported ratio LARGER.
"""
import json
import sys

ten_path, hundred_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
extra_tens = sys.argv[4:]


def load(p):
    with open(p) as f:
        return json.load(f)


def min_rep(art, name):
    # warm min for incremental rows (cold pays the store build)
    inc = art.get("incremental", {})
    if name in inc:
        return inc[name]["warm"]
    return min(art["rep_times"][name])


ten = load(ten_path)
hundred = load(hundred_path)
tens = [ten] + [load(p) for p in extra_tens]

rows = {}
for name in sorted(hundred["rep_times"]):
    if name not in ten["rep_times"]:
        continue
    t10 = min(min_rep(a, name) for a in tens if name in a["rep_times"])
    t100 = min_rep(hundred, name)
    ratio = round(t100 / t10, 2)
    # 10x data between the legs: <=10 linear-or-better
    curve = ("sublinear" if ratio <= 8.0 else
             "linear" if ratio <= 11.0 else "SUPERLINEAR")
    rows[name] = {
        "t_10x_sec": round(t10, 3),
        "t_100x_sec": round(t100, 3),
        "ratio_at_10x_data": ratio,
        "curve": curve,
        "rep_times_10x": [a["rep_times"][name] for a in tens
                          if name in a["rep_times"]],
        "rep_times_100x": hundred["rep_times"][name],
    }

art = {
    "what": ("round-10 100x probe (round-9 verdict item 3): the heaviest "
             "dedup/graph families measured at the 10x (scale_sf1) and "
             "100x (scale_sf10, make_scale.py --mult 10) fixtures; ratio "
             "is min-rep (warm for incremental rows) 100x/10x against 10x "
             "data, protocol 8 GB heap / 32 threads"),
    "note": ("multiple 10x legs are folded by per-row MIN (conservative: "
             "a lower 10x denominator inflates the reported ratio); "
             "failed lists from both legs attached"),
    "failed_10x": ten.get("failed", []),
    "failed_100x": hundred.get("failed", []),
    "rows": rows,
}
with open(out_path, "w") as f:
    json.dump(art, f, indent=1)
print(out_path)
for n, r in rows.items():
    print(f"  {n:28s} {r['t_10x_sec']:8.2f} -> {r['t_100x_sec']:8.2f} s  "
          f"x{r['ratio_at_10x_data']:.2f}  {r['curve']}")
