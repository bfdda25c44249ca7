"""Round-end revalidation, pinned as one entry point (VERDICT r3 item 6:
"it's manual discipline, not a pinned script").

Runs, in order:

1. full-scale HF parity   — ``MPR_FULLSCALE=1 pytest tests/test_fullscale_parity.py``
   (true t5-small / ViT-B/32 / t5-large dims vs the HF oracle; ~3 min)
2. cross-framework parity — ``scripts/run_parity.py`` (trains both
   frameworks on shared weights, diffs metric tables; ~10 min)
3. TPU kernel check       — ``scripts/tpu_kernel_check.py`` (real Mosaic
   lowerings; skipped with a note when no TPU is reachable)
4. multi-chip dryrun      — ``__graft_entry__.dryrun_multichip(8)`` on an
   8-device virtual CPU mesh (DP/TP/PP/SP + sharded decode/retrieval)

and appends a dated PASS/FAIL record to PARITY.md. Exit code 0 iff every
non-skipped step passed.

    python scripts/revalidate.py [--skip-parity] [--skip-kernels] [--quick]

``--quick`` drops the (slow) cross-framework parity run — for mid-round
spot checks; round-end runs should use the full set.
"""

from __future__ import annotations

import argparse
import datetime
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)


def _run(name: str, cmd, env=None, timeout=3600):
    """Run one step; returns (name, status, seconds, detail)."""
    print(f"== {name}: {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.time()
    try:
        r = subprocess.run(cmd, cwd=_REPO, env=e, timeout=timeout,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return name, "FAIL", time.time() - t0, f"timeout after {timeout}s"
    dt = time.time() - t0
    tail = "\n".join((r.stdout + r.stderr).strip().splitlines()[-25:])
    print(tail, flush=True)
    # 220: the dryrun summary line grew past the old 160 cap when the
    # pp_tp_loss leg was added and the recorded evidence got cut mid-word
    detail = (r.stdout.strip().splitlines() or [""])[-1][:220]
    return name, ("PASS" if r.returncode == 0 else "FAIL"), dt, detail


def _tpu_reachable() -> bool:
    probe = ("import jax; assert any(d.platform != 'cpu' "
             "for d in jax.devices())")
    try:
        return subprocess.run([sys.executable, "-c", probe], cwd=_REPO,
                              capture_output=True,
                              timeout=180).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-parity", action="store_true")
    p.add_argument("--skip-kernels", action="store_true")
    p.add_argument("--quick", action="store_true",
                   help="alias for --skip-parity (mid-round spot check)")
    args = p.parse_args()
    skip_parity = args.skip_parity or args.quick

    results = []
    results.append(_run(
        "fullscale-parity",
        [sys.executable, "-m", "pytest", "tests/test_fullscale_parity.py",
         "-q", "--no-header"],
        env={"MPR_FULLSCALE": "1", "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        timeout=1800))
    if skip_parity:
        results.append(("cross-framework-parity", "SKIP", 0.0,
                        "--quick/--skip-parity"))
    else:
        results.append(_run(
            "cross-framework-parity",
            [sys.executable, "scripts/run_parity.py"], timeout=3600))
    if args.skip_kernels:
        results.append(("tpu-kernels", "SKIP", 0.0, "--skip-kernels"))
    elif not _tpu_reachable():
        results.append(("tpu-kernels", "SKIP", 0.0, "no TPU reachable"))
    else:
        results.append(_run(
            "tpu-kernels", [sys.executable, "scripts/tpu_kernel_check.py"],
            timeout=1800))
    results.append(_run(
        "multichip-dryrun", [sys.executable, "__graft_entry__.py"],
        env={"JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        timeout=1800))

    ok = all(s != "FAIL" for _, s, _, _ in results)
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    head = os.popen(f"git -C {_REPO} rev-parse --short HEAD").read().strip()
    lines = [f"\n## Revalidation {stamp} (tree {head}) — "
             f"{'ALL PASS' if ok else 'FAILURES'}\n"]
    for name, status, dt, detail in results:
        lines.append(f"- {name}: **{status}** ({dt:.0f}s) — {detail}")
    record = "\n".join(lines) + "\n"
    print(record)
    with open(os.path.join(_REPO, "PARITY.md"), "a") as f:
        f.write(record)
    print(f"appended to PARITY.md; overall: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
