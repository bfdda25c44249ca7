"""Summarize a jax.profiler trace (trace.json.gz) by device-op cost.

    python - <<'PY'
    import jax; jax.profiler.start_trace("/tmp/trace")
    ...run jitted fns...
    jax.profiler.stop_trace()
    PY
    python scripts/parse_trace.py /tmp/trace [top_n]

Works on the tunneled-TPU platform (which writes both .xplane.pb and the
Chrome-trace JSON); no tensorboard/tensorflow needed. This is how the
round-1 ViT bottleneck was localized (docs/TPU_NOTES.md): 25% of the tower
was an elementwise fusion that absorbed the attention head-merge transpose
(strided reads), plus 25% raw layout copies.
"""

import collections
import glob
import gzip
import json
import sys


def summarize(trace_dir: str, top_n: int = 25):
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            pname = pids.get(e.get("pid"), "")
            if "TPU" not in pname and "device" not in pname.lower():
                continue
            name = e["name"]
            if name.startswith(("jit_", "while")):  # enclosing regions
                total = max(total, dur[("__program__", name)] + e["dur"])
                dur[("__program__", name)] += e["dur"]
                cnt[("__program__", name)] += 1
                continue
            key = (pname, name[:70])
            dur[key] += e["dur"]
            cnt[key] += 1
    print(f"{'total ms':>10}  {'count':>6}  op")
    for (p, n), d in dur.most_common(top_n):
        tag = "program" if p == "__program__" else "op"
        print(f"{d / 1000:10.2f}  {cnt[(p, n)]:6d}  [{tag}] {n}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
