"""Summarize a jax.profiler trace's DEVICE timeline (works through the
axon tunnel — round-5 discovery: /device:TPU:0 op spans are captured).

Usage: python scripts/trace_summary.py <trace_dir> [out.json]

Reports, for the union of /device:TPU:* timelines:
  wall           last device op end - first start
  busy / gap     union of op intervals vs wall (gap = device idle = host
                 dispatch stalls + tunnel latency the pipeline failed to
                 hide)
  dispatches     number of top-level jit_* program spans
  top self-time  per op-name aggregate (containers excluded), the honest
                 in-dispatch attribution (kernels vs copies/slices/pads)
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def load_events(trace_dir: str):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no trace.json.gz under {trace_dir}"
    d = json.loads(gzip.open(paths[-1]).read())
    ev = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [e for e in ev if e.get("ph") == "X"
           and str(pids.get(e["pid"], "")).startswith("/device:")]
    return dev, paths[-1]


def union_busy(spans):
    ivs = sorted((e["ts"], e["ts"] + e.get("dur", 0.0)) for e in spans)
    busy = 0.0
    cur_s = cur_e = None
    for s, t in ivs:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, t
        else:
            cur_e = max(cur_e, t)
    if cur_e is not None:
        busy += cur_e - cur_s
    return busy


def summarize(trace_dir: str) -> dict:
    dev, path = load_events(trace_dir)
    assert dev, "no device events in trace"
    t0 = min(e["ts"] for e in dev)
    t1 = max(e["ts"] + e.get("dur", 0.0) for e in dev)
    wall = t1 - t0
    progs = [e for e in dev if e["name"].startswith("jit_")]
    ops = [e for e in dev if not e["name"].startswith("jit_")]
    busy = union_busy(progs if progs else ops)

    def base(name: str) -> str:
        # strip trailing .N / (fingerprint) so instances aggregate
        n = name.split("(")[0]
        while n and (n[-1].isdigit() or n[-1] == "."):
            n = n[:-1]
        return n or name

    agg = collections.Counter()
    for e in ops:
        agg[base(e["name"])] += e.get("dur", 0.0)
    top = [{"op": k, "total_ms": round(v / 1e3, 3)}
           for k, v in agg.most_common(15)]
    prog_agg = collections.Counter()
    for e in progs:
        prog_agg[base(e["name"])] += e.get("dur", 0.0)
    top_progs = [{"program": k, "total_ms": round(v / 1e3, 3)}
                 for k, v in prog_agg.most_common(12)]

    # attribute each op span to the program span containing it — the
    # per-program op mix is the actionable view (round 5: it localized the
    # flagship's fan MAC fusions at 192 ms vs 24 ms of NTT inside
    # jit__diag_fan_core, which motivated the fan-wide paired-REDC MAC)
    import bisect

    sprogs = sorted(progs, key=lambda e: e["ts"])
    starts = [p["ts"] for p in sprogs]
    per = collections.defaultdict(collections.Counter)
    for e in ops:
        i = bisect.bisect_right(starts, e["ts"]) - 1
        if i >= 0 and e["ts"] < sprogs[i]["ts"] + sprogs[i].get("dur", 0.0):
            per[base(sprogs[i]["name"])][base(e["name"])] += e.get("dur", 0.0)
        else:
            per["<outside>"][base(e["name"])] += e.get("dur", 0.0)
    per_program_ops = [
        {
            "program": pname,
            "total_ms": round(sum(c.values()) / 1e3, 2),
            "ops_ms": {op: round(v / 1e3, 2) for op, v in c.most_common(6)},
        }
        for pname, c in sorted(per.items(), key=lambda kv: -sum(kv[1].values()))
    ]
    return {
        "metric": "device_trace_summary",
        "trace": path,
        "wall_ms": round(wall / 1e3, 2),
        "device_busy_ms": round(busy / 1e3, 2),
        "device_idle_ms": round((wall - busy) / 1e3, 2),
        "busy_frac": round(busy / wall, 4) if wall else None,
        "dispatches": len(progs),
        "top_ops_self_ms": top,
        "top_programs_ms": top_programs_note(top_progs),
        "per_program_ops": per_program_ops,
    }


def top_programs_note(top_progs):
    return top_progs


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/boot_trace"
    out = summarize(trace_dir)
    print(json.dumps(out, indent=1))
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            json.dump(out, f, indent=1)
