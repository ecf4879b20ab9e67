"""Shared trace.json analysis: device-op time attributed to source lines.

jax.profiler traces carry a `source` (file:line) arg per XLA-op event;
aggregating device time by source is the honest per-pass profile (the
chained-jit marginal numbers in PERF.md under- and over-counted badly —
e.g. fog build measured 3.9 ms marginal but traces at 0.6 ms).
"""
import collections
import glob
import gzip
import json


def load_ops(trace_dir):
    """Returns (op_events, module_events, n_modules) from the newest
    trace in trace_dir.  Op events are XLA-Ops-thread device events."""
    files = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(files[-1]))
    evs = data.get("traceEvents", [])
    dev_pids = {e.get("pid") for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in (e.get("args", {}).get("name") or "")}
    tid_name = {(e.get("pid"), e.get("tid")): e.get("args", {}).get("name")
                for e in evs
                if e.get("ph") == "M" and e.get("name") == "thread_name"}
    ops, mods = [], []
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_name.get((e.get("pid"), e.get("tid")), "")
        if tname == "XLA Ops":
            ops.append(e)
        elif tname == "XLA Modules":
            mods.append(e)
    return ops, mods


def report(trace_dir, n_frames, top=40, min_ms=0.02):
    """Print module ms/frame + per-source and per-file aggregation."""
    ops, mods = load_ops(trace_dir)
    mod_ms = sum(m["dur"] for m in mods) / 1e3 / max(n_frames, 1)
    tot_ms = sum(e["dur"] for e in ops) / 1e3 / max(n_frames, 1)
    print(f"\nmodule wall: {mod_ms:.2f} ms/frame over {len(mods)} runs; "
          f"op sum {tot_ms:.2f} ms/frame; {len(ops) // max(n_frames, 1)} "
          "ops/frame")
    # duration-band histogram: the round-4 verdict's "unattributed
    # residue" lives in the 5-100 us mid-band (hundreds of small
    # fusions/copies/casts) — name its weight explicitly
    bands = [(0, 5), (5, 20), (20, 100), (100, 1e9)]
    print("== op duration bands (ms/frame) ==")
    for lo, hi in bands:
        sel = [e["dur"] for e in ops if lo <= e["dur"] < hi]
        label = f"{lo:>4.0f}-{hi:<6.0f}us" if hi < 1e9 else f"  >={lo:.0f}us    "
        print(f"  {label} {sum(sel) / 1e3 / n_frames:8.3f} "
              f"x{len(sel) // max(n_frames, 1):5d}")
    bysrc = collections.defaultdict(lambda: [0.0, 0])
    byfile = collections.defaultdict(lambda: [0.0, 0])
    for e in ops:
        src = e.get("args", {}).get("source", "?")
        d = e["dur"] / 1e3
        bysrc[src][0] += d
        bysrc[src][1] += 1
        f = src.split(":")[0].split("/")[-1] if src != "?" else "?"
        byfile[f][0] += d
        byfile[f][1] += 1
    print("\n== by file (ms/frame) ==")
    for f, (ms, c) in sorted(byfile.items(), key=lambda kv: -kv[1][0]):
        if ms / n_frames < min_ms:
            break
        print(f"  {ms / n_frames:8.3f} x{c // n_frames:5d}  {f}")
    print(f"\n== top {top} source lines (ms/frame) ==")
    for s, (ms, c) in sorted(bysrc.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"  {ms / n_frames:8.3f} x{c // n_frames:5d}  "
              f"{s.replace('/root/repo/', '')}")
    # the source-less residue, grouped by op-name prefix (copy/fusion/
    # dynamic-slice/...) — this is where layout copies and loop
    # plumbing hide
    noname = collections.defaultdict(lambda: [0.0, 0])
    for e in ops:
        if e.get("args", {}).get("source", "?") != "?":
            continue
        key = e.get("name", "?").rstrip("0123456789.")
        noname[key][0] += e["dur"] / 1e3
        noname[key][1] += 1
    if noname:
        print("\n== unattributed ops by name prefix (ms/frame) ==")
        for k, (ms, c) in sorted(noname.items(), key=lambda kv: -kv[1][0])[:15]:
            if ms / n_frames < min_ms:
                break
            print(f"  {ms / n_frames:8.3f} x{c // n_frames:5d}  {k}")
    return bysrc, byfile, mod_ms
