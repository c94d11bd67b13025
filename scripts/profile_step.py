"""Profile the flagship coupled step on the TPU and summarize trace events.

Usage: python scripts/profile_step.py [outdir]
Produces a jax profiler trace, then parses the trace.json.gz and prints the
top ops by total device duration, grouped by fusion/op name.
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/su2_trace"
    import __graft_entry__ as g

    fn, args = g.entry()
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    ignite = args[-1]

    def advance(state):
        o = jfn(*state)
        return (o[0], o[1], o[2], o[3], o[4], o[5], ignite)

    state = advance(args)
    jax.block_until_ready(state[0])

    with jax.profiler.trace(outdir):
        for _ in range(10):
            state = advance(state)
        jax.block_until_ready(state[0])

    # find trace.json.gz
    traces = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                       recursive=True)
    traces.sort(key=os.path.getmtime)
    if not traces:
        print("no trace found under", outdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    # device-side complete events
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # heuristics: TPU op events live on pids whose process name contains TPU
    pid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "/device" in n}
    agg = {}
    total = 0.0
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e["dur"]
        total += e["dur"]
    print(f"total device time: {total/1e3:.2f} ms over 10 iters "
          f"({total/1e4:.3f} ms/iter)")
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
    for name, dur in top:
        print(f"{dur/1e4:9.4f} ms/iter  {100*dur/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
