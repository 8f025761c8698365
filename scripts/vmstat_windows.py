"""Summarize a `vmstat 5` side log into labeled CPU-activity windows.

Round-5 scaling session 3 (BENCH/SESSIONS_r5.md) runs the identical
`bench.py --scaling --runs 5` protocol with a `vmstat 5` logger beside
it, so a degraded round can be attributed LIVE: if the guest's own
vmstat shows the expected CPU signature (confined local[2] ~6% user,
local[8] ~25% user on 32 vCPUs, runqueue == confined level, zero other
load) while the wall clock stretches, the stall is host-phase capacity
outside the VM — the same conclusion rounds 4's controlled experiments
reached by elimination, now with in-window evidence.

Usage: python scripts/vmstat_windows.py /tmp/vmstat_session3.log \
           --start 2026-08-19T02:02:41Z

Prints one row per contiguous activity window (a maximal run of
samples whose user-CPU%% bucket is stable), with wall offsets, mean
user/system/idle/iowait, mean runqueue, and the inferred phase label:

  idle        us < 2        (between runs / JVM teardown)
  local2      2 <= us < 12  (2 confined cores of 32 ~= 6% + pyarrow)
  local8      12 <= us < 45 (8 confined cores ~= 25% + python workers)
  local32     us >= 45      (the unconfined sf0.1 bench prologue)

The labels are heuristic (JVM startup and parquet IO blur edges); the
point is coarse alignment of vmstat time against the SCALE_RUN lines,
plus a flat `other_load` check: any window whose signature matches NO
phase (e.g. us high while no run should be active) would mean the
guest itself was contended and the session is invalid evidence.
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys


def parse_vmstat(path: str) -> list[dict]:
    rows = []
    with open(path) as f:
        for ln in f:
            parts = ln.split()
            # data rows are all-numeric and 17 columns on this vmstat
            if len(parts) >= 17 and parts[0].lstrip("-").isdigit():
                try:
                    r = [int(x) for x in parts[:17]]
                except ValueError:
                    continue
                rows.append(
                    {
                        "r": r[0],
                        "us": r[12],
                        "sy": r[13],
                        "id": r[14],
                        "wa": r[15],
                        "st": r[16],
                    }
                )
    return rows


def label(us: float) -> str:
    if us < 2:
        return "idle"
    if us < 12:
        return "local2"
    if us < 45:
        return "local8"
    return "local32"


def windows(rows: list[dict], interval: int = 5, min_len: int = 3) -> list[dict]:
    """Contiguous same-label runs of samples, short blips merged into
    their neighbor by the min_len threshold."""
    out: list[dict] = []
    for i, row in enumerate(rows):
        lab = label(row["us"])
        if out and out[-1]["label"] == lab:
            out[-1]["rows"].append(row)
        else:
            out.append({"label": lab, "start_i": i, "rows": [row]})
    # merge blips shorter than min_len into the previous window
    merged: list[dict] = []
    for w in out:
        if merged and len(w["rows"]) < min_len:
            merged[-1]["rows"].extend(w["rows"])
        elif merged and merged[-1]["label"] == w["label"]:
            merged[-1]["rows"].extend(w["rows"])
        else:
            merged.append(w)
    for w in merged:
        n = len(w["rows"])
        w["t0_s"] = w["start_i"] * interval
        w["dur_s"] = n * interval
        for k in ("r", "us", "sy", "id", "wa", "st"):
            w[f"mean_{k}"] = sum(r[k] for r in w["rows"]) / n
        del w["rows"]
    return merged


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--start", help="ISO8601 wall time of the log's first sample")
    ap.add_argument("--interval", type=int, default=5)
    args = ap.parse_args(argv)

    rows = parse_vmstat(args.log)
    if not rows:
        print("no vmstat data rows parsed", file=sys.stderr)
        return 1
    t0 = (
        dt.datetime.fromisoformat(args.start.replace("Z", "+00:00"))
        if args.start
        else None
    )
    print(
        f"{'window':>8} {'label':>8} {'t0':>20} {'dur_s':>7} "
        f"{'us':>5} {'sy':>5} {'id':>5} {'wa':>4} {'st':>4} {'runq':>5}"
    )
    for i, w in enumerate(windows(rows, args.interval)):
        t = (
            (t0 + dt.timedelta(seconds=w["t0_s"])).strftime("%H:%M:%S")
            if t0
            else f"+{w['t0_s']}s"
        )
        print(
            f"{i:>8} {w['label']:>8} {t:>20} {w['dur_s']:>7} "
            f"{w['mean_us']:>5.1f} {w['mean_sy']:>5.1f} {w['mean_id']:>5.1f} "
            f"{w['mean_wa']:>4.1f} {w['mean_st']:>4.1f} {w['mean_r']:>5.1f}"
        )
    # the other-load check: steal and iowait should be ~0 throughout
    st = max(r["st"] for r in rows)
    wa = max(r["wa"] for r in rows)
    print(f"\nmax steal% across session: {st}   max iowait%: {wa}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
