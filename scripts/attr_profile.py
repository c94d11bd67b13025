"""Attribute TPU trace time to source lines via compiled-HLO metadata.

Usage: python scripts/attr_profile.py <trace_dir>
Compiles the flagship coupled step, parses the optimized HLO for
instruction metadata (op_name / source_file:line), then joins it against
the device events of the newest trace under <trace_dir> and prints time
grouped by source location.
"""

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def hlo_metadata_index(hlo_text):
    """instruction name -> (source, op_path) from optimized HLO text."""
    idx = {}
    pat = re.compile(
        r"%?([\w.\-]+) = [^\n]*?metadata={([^}]*)}")
    for m in pat.finditer(hlo_text):
        name, meta = m.group(1), m.group(2)
        op = re.search(r'op_name="([^"]*)"', meta)
        sf = re.search(r'source_file="([^"]*)"', meta)
        sl = re.search(r"source_line=(\d+)", meta)
        src = ""
        if sf:
            src = f"{os.path.basename(sf.group(1))}:{sl.group(1) if sl else '?'}"
        idx[name] = (src, op.group(1) if op else "")
    return idx


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/su2_trace"
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    idx = hlo_metadata_index(hlo)

    traces = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                              recursive=True), key=os.path.getmtime)
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    pid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "/device" in n}
    agg = {}
    n_iters = 0
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e or e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        if name.startswith("jit_step("):
            n_iters += 1
            continue
        agg[name] = agg.get(name, 0.0) + e["dur"]
    n_iters = max(n_iters, 1)

    by_src = {}
    for name, dur in agg.items():
        src, op = idx.get(name, ("?", ""))
        # take the last two op_name path segments for grouping
        opkey = "/".join(op.split("/")[-2:]) if op else ""
        key = (src, opkey)
        by_src[key] = by_src.get(key, 0.0) + dur
    total = sum(by_src.values())
    print(f"attributed total {total/1e3/n_iters:.3f} ms/iter over "
          f"{len(agg)} distinct ops, {n_iters} iters")
    for (src, op), dur in sorted(by_src.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{dur/1e3/n_iters:8.4f} ms/iter {100*dur/total:5.1f}%  "
              f"{src:34s} {op[:70]}")


if __name__ == "__main__":
    main()
