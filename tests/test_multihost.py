"""Multi-host (multi-process) data parallelism — parallel/multihost.py.

The reference is single-process/single-GPU (SURVEY.md §2c); the multi-host
story is this framework's own. Validated without a cluster: two OS
processes × N virtual CPU devices form a jax.distributed cluster (gloo
collectives standing in for DCN) and must train identically to one process
driving the same global device count — same losses, same final parameters,
same checkpoint (up to cross-process reduction-order float noise, observed
≤4e-7). Workers run tests/multihost_worker.py.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(mode, nproc, devices_per_proc, out, root=None, timeout=900):
    """Launch nproc workers; wait; fail loudly with their output."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pin their own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for p in range(nproc):
        cmd = [sys.executable, WORKER, "--mode", mode,
               "--nproc", str(nproc), "--proc", str(p),
               "--port", str(port), "--devices", str(devices_per_proc),
               "--out", out]
        if root:
            cmd += ["--root", root]
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    fail = []
    for p, pr in enumerate(procs):
        try:
            out_text, _ = pr.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if pr.returncode != 0:
            fail.append(f"--- proc {p} rc={pr.returncode} ---\n{out_text}")
    assert not fail, "\n".join(fail)


def test_two_process_train_step_matches_single_process(tmp_path):
    """3 train steps on the tiny model: 2 procs × 2 devices vs 1 proc × 4
    devices (same 4-device global mesh) — identical losses and params."""
    multi = str(tmp_path / "multi.npz")
    single = str(tmp_path / "single.npz")
    _run("step", nproc=2, devices_per_proc=2, out=multi)
    _run("step", nproc=1, devices_per_proc=4, out=single)

    with open(multi + ".json") as f:
        m = json.load(f)
    with open(single + ".json") as f:
        s = json.load(f)
    assert m["n_devices"] == 4 and s["n_devices"] == 4
    np.testing.assert_allclose(m["losses"], s["losses"], rtol=0, atol=1e-6)
    a, b = np.load(multi), np.load(single)
    assert sorted(a.files) == sorted(b.files)
    for k in a.files:
        np.testing.assert_allclose(
            a[k], b[k], rtol=1e-6, atol=1e-7,
            err_msg=f"param {k} diverged between 1-proc and 2-proc runs")


def test_two_process_experiment_matches_single_process(tmp_path):
    """Full Experiment.train (synthetic SLAKE, vision-token cache on) under
    2 processes: the primary's checkpoint + metrics match a single-process
    run over the same global mesh; the secondary writes nothing."""
    from multimodalpromptretrieval_tpu.data.synthetic import (
        generate_synthetic_slake,
    )

    root = str(tmp_path / "synth")
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=16,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    multi = str(tmp_path / "multi")
    single = str(tmp_path / "single")
    os.makedirs(multi), os.makedirs(single)
    # single first: it also warms the shared image cache under root so the
    # 2-proc run doesn't race to create it (one writer per shared FS —
    # mirrors a real deployment where caches are pre-built)
    _run("experiment", nproc=1, devices_per_proc=4, out=single, root=root)
    _run("experiment", nproc=2, devices_per_proc=2, out=multi, root=root)

    with open(os.path.join(multi, "result.json")) as f:
        m = json.load(f)
    with open(os.path.join(single, "result.json")) as f:
        s = json.load(f)
    assert m["n_devices"] == 4 and s["n_devices"] == 4
    np.testing.assert_allclose(m["best_valid_loss"], s["best_valid_loss"],
                               rtol=0, atol=1e-6)
    # eval ran under the cluster too: same split coverage, same accuracy
    assert m["n_scored"] == s["n_scored"] == 24
    np.testing.assert_allclose(m["overall"], s["overall"], atol=1e-9)

    def ckpt(d):
        files = os.listdir(os.path.join(d, "models"))
        (name,) = [f for f in files if f.endswith(".npz")]
        return np.load(os.path.join(d, "models", name))

    a, b = ckpt(multi), ckpt(single)
    assert sorted(a.files) == sorted(b.files)
    for k in a.files:
        if a[k].dtype.kind in "fc":
            # gloo's cross-process psum may reduce in a different order
            # than the single-process all-reduce: float-precision noise
            # (observed max 3.5e-7 on one element), not a semantic gap
            np.testing.assert_allclose(
                a[k], b[k], rtol=1e-5, atol=1e-6,
                err_msg=f"checkpoint entry {k} diverged")
        else:
            assert (a[k] == b[k]).all(), k

    def losses(d):
        logs = os.path.join(d, "logs")
        (prefix,) = [f for f in os.listdir(logs)
                     if os.path.isdir(os.path.join(logs, f))]
        with open(os.path.join(logs, prefix,
                               "training_loss.txt")) as f:
            rows = f.read().strip().splitlines()[1:]
        return [tuple(float(v) for v in r.split(",")) for r in rows]

    np.testing.assert_allclose(losses(multi), losses(single),
                               rtol=1e-5, atol=1e-6)
