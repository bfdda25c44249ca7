"""bench.py ``--mode all`` record robustness (VERDICT r3 item 1).

Round 3's driver-captured record was lost because one stage crashed on a
transient tunnel fault and the single JSON print sat after all stages.
These tests prove the restructured run_all emits a (partial) record no
matter which stage dies: stages are stubbed out at the module level, one
is killed, and the printed JSON line is asserted to carry every
surviving number plus a per-stage ``errors`` entry. Pure-host tests — no
jax, no device work.
"""

from __future__ import annotations

import json

import pytest

import bench


def _args(tmp_path, **over):
    ns = bench.build_parser().parse_args([])
    ns.data_dir = str(tmp_path)
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def _record(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    assert out, "run_all printed no record at all"
    return json.loads(out[-1])


def _stub_all(monkeypatch, **over):
    """Stub every stage fn with cheap deterministic results; ``over``
    replaces individual stages (e.g. a crashing one)."""
    monkeypatch.setattr(bench, "RETRY_WAIT", 0.0)
    stubs = {
        "run_e2e": lambda a, d, style="short": (100.0, 90.0, 110.0, 50.0),
        "run_device": lambda a: (500.0, {"device_serve_mfu": 0.31}),
        "run_train": lambda a, d: (300.0, {"train_step_mfu": 0.44}),
        "run_e2e_trained": lambda a, d, train_if_missing=True,
        style="short", spec=0, **kw: (800.0, 790.0, 900.0),
        "run_e2e_int8": lambda a, d, style="short": (850.0, 840.0, 950.0,
                                                     1.0, True),
    }
    stubs.update(over)
    for name, fn in stubs.items():
        monkeypatch.setattr(bench, name, fn)


def _forge_long_ckpt(args, data_dir, ver="t5-small", marked=True):
    """Write a fake long-style checkpoint (+ provision-marked sidecar) at
    the exact path the ``all`` long stages gate on."""
    import os

    base = bench._t5_large_args(args) if ver == "t5-large" else args
    ck = bench.trained_ckpt_path(base, data_dir, "long", ver)
    os.makedirs(os.path.dirname(ck), exist_ok=True)
    with open(ck, "wb") as f:
        f.write(b"npz")
    with open(ck + ".json", "w") as f:
        f.write('{"provision": "long-style deferred single save"}'
                if marked else '{"epoch": 1, "valid_loss": 2.0}')
    return ck


def test_full_stub_record_schema(monkeypatch, capsys, tmp_path):
    """All stages green: every pre-seeded field is populated or None, the
    headline is the e2e number, and there is no errors field."""
    _stub_all(monkeypatch)
    args = _args(tmp_path)
    # the long stages gate on a provision-MARKED checkpoint on disk
    _forge_long_ckpt(args, str(tmp_path))
    bench.run_all(args)
    rec = _record(capsys)
    assert rec["value"] == 100.0
    assert rec["vs_baseline"] == pytest.approx(0.05)
    assert rec["e2e_pipelined_qa_per_sec"] == 110.0
    assert rec["open_e2e_qa_per_sec"] == 100.0
    assert rec["e2e_trained_earlystop_qa_per_sec"] == 800.0
    assert rec["long_trained_qa_per_sec"] == 800.0
    assert rec["long_trained_spec_decode_qa_per_sec"] == 800.0
    assert rec["open_trained_length_sort_qa_per_sec"] == 800.0
    # spec decode's short/open-corpus stages were settled negatives and
    # are no longer re-measured (VERDICT r4 item 2): the long stages
    # above carry its recorded verdict
    assert "open_trained_spec_decode_qa_per_sec" not in rec
    assert rec["e2e_int8_pipelined_qa_per_sec"] == 950.0
    assert rec["int8_used_trained_checkpoint"] is True
    assert rec["device_only_qa_per_sec"] == 500.0
    assert rec["device_serve_mfu"] == 0.31
    assert rec["train_step_mfu"] == 0.44
    assert "errors" not in rec
    # stages that ran emit no skip markers
    assert "trained_skipped" not in rec
    assert "long_trained_skipped" not in rec
    # no t5-large checkpoint in tmp_path -> skipped note, fields stay None
    assert rec["t5_large_skipped"] == bench._PROVISION_HINT
    assert rec["t5_large_long_skipped"] == bench._PROVISION_HINT
    assert rec["t5_large_trained_qa_per_sec"] is None


def test_cold_host_record_is_self_diagnosing(monkeypatch, capsys,
                                             tmp_path):
    """The r4 weak-#1 shape: a fresh host has no cached checkpoints, so
    every checkpoint-gated stage must emit an explicit ``<stage>_skipped``
    marker pointing at ``--mode provision`` — never a silent null."""
    _stub_all(monkeypatch,
              run_e2e_trained=lambda a, d, train_if_missing=True,
              style="short", spec=0, **kw: None)
    bench.run_all(_args(tmp_path))
    rec = _record(capsys)
    for marker in ("trained_skipped", "open_trained_skipped",
                   "open_trained_lsort_skipped", "long_trained_skipped",
                   "long_trained_spec_skipped", "t5_large_skipped",
                   "t5_large_long_skipped"):
        assert rec[marker] == bench._PROVISION_HINT, marker
    # the non-checkpoint stages still measured; no errors recorded
    assert rec["value"] == 100.0
    assert rec["device_only_qa_per_sec"] == 500.0
    assert "errors" not in rec
    assert rec["e2e_trained_earlystop_qa_per_sec"] is None


def test_provision_trains_every_gated_checkpoint(monkeypatch, capsys,
                                                 tmp_path):
    """``--mode provision`` must request training for every (version,
    style) pair the ``all`` ride-alongs are gated on, then warm the
    stage programs, and emit ONE stdout JSON line."""
    calls = []

    def fake_trained(a, d, train_if_missing=False, style="short",
                     spec=0, train_batch=0, trainer_overrides=None, **kw):
        calls.append((getattr(a, "t5_version", "t5-small"), style,
                      train_if_missing))
        return (800.0, 790.0, 900.0)

    long_calls = []

    def fake_long(a, large):
        long_calls.append(large)
        name = "ckpt_" + ("t5_large" if large else "t5_small") + "_long"
        return {name: "ok"}

    _stub_all(monkeypatch, run_e2e_trained=fake_trained)
    monkeypatch.setattr(bench, "provision_train_long", fake_long)
    bench.run_provision(_args(tmp_path))
    # the warm pass redirects run_all's record off stdout: exactly one
    # stdout JSON line total (the driver contract)
    json_lines = [ln for ln in capsys.readouterr().out.splitlines()
                  if ln.startswith("{")]
    assert len(json_lines) == 1
    rec = json.loads(json_lines[0])
    # short/open train through the reference-semantics path; long styles
    # through the high-acceptance deferred-save trainer
    trained = {(v, s) for v, s, t in calls if t}
    assert trained == {("t5-small", "short"), ("t5-small", "open"),
                       ("t5-large", "open")}
    assert long_calls == [False, True]
    assert rec["metric"] == "bench_provision"
    assert rec["provisioned"]["ckpt_t5_large_long"] == "ok"
    assert rec["provisioned"]["ckpt_t5_small_long"] == "ok"
    assert rec["provisioned"]["warmed_all_programs"] is True
    assert "errors" not in rec


def test_provision_survives_one_dead_checkpoint(monkeypatch, capsys,
                                                tmp_path):
    """One checkpoint build dying terminally must not sink provisioning
    of the rest (same _run_stage contract as the record)."""

    def flaky_trained(a, d, train_if_missing=False, style="short", **kw):
        if style == "open" and getattr(a, "t5_version", "") == "t5-large":
            raise RuntimeError("OOM: out of HBM")
        return (800.0, 790.0, 900.0)

    _stub_all(monkeypatch, run_e2e_trained=flaky_trained)
    monkeypatch.setattr(
        bench, "provision_train_long",
        lambda a, large: {"ckpt_" + ("t5_large" if large else "t5_small")
                          + "_long": "ok"})
    bench.run_provision(_args(tmp_path))
    rec = _record(capsys)
    assert "ckpt_t5_large_open" in rec["errors"]
    assert rec["provisioned"]["ckpt_t5_large_long"] == "ok"
    assert rec["provisioned"]["ckpt_t5_small_short"] == "ok"


def test_partial_record_when_one_stage_dies(monkeypatch, capsys, tmp_path):
    """The r3 failure shape: a stage crashes terminally mid-run — every
    already-measured number must survive into the printed record."""

    def boom(a, d):
        raise RuntimeError("boom")

    _stub_all(monkeypatch, run_train=boom)
    bench.run_all(_args(tmp_path))
    rec = _record(capsys)
    assert rec["value"] == 100.0                    # headline survived
    assert rec["device_only_qa_per_sec"] == 500.0   # later stage ran
    assert rec["train_ex_per_sec"] is None          # the dead stage's field
    assert "boom" in rec["errors"]["train"]


def test_transient_fault_is_retried(monkeypatch, capsys, tmp_path):
    """A tunnel-class fault (the exact r3 message) is retried; success on
    a later attempt leaves no errors entry."""
    calls = {"n": 0}

    def flaky(a, d, style="short"):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "remote_compile: read body: response body closed")
        return (100.0, 90.0, 110.0, 50.0)

    _stub_all(monkeypatch, run_e2e=flaky)
    bench.run_all(_args(tmp_path))
    rec = _record(capsys)
    assert calls["n"] >= 2
    assert rec["value"] == 100.0
    assert "errors" not in rec


def test_transient_fault_exhausts_retries_and_is_recorded(
        monkeypatch, capsys, tmp_path):
    calls = {"n": 0}

    def down(a, d, style="short"):
        calls["n"] += 1
        raise RuntimeError("backend UNAVAILABLE: socket closed")

    _stub_all(monkeypatch, run_e2e_int8=down)
    bench.run_all(_args(tmp_path))
    rec = _record(capsys)
    # two int8 stages (short + open corpus), each retried RETRIES times
    assert calls["n"] == 2 * (bench.RETRIES + 1)
    assert "int8" in rec["errors"] and "open_int8" in rec["errors"]
    assert rec["value"] == 100.0  # the rest of the record survived


def test_headline_falls_back_when_e2e_dies(monkeypatch, capsys, tmp_path):
    def dead(a, d, style="short"):
        raise TypeError("hard failure")

    _stub_all(monkeypatch, run_e2e=dead)
    bench.run_all(_args(tmp_path))
    rec = _record(capsys)
    assert rec["value"] == 800.0  # promoted from the trained stage
    assert rec["headline_fallback_from"] == "e2e_trained_earlystop_qa_per_sec"
    assert rec["vs_baseline"] == pytest.approx(0.4)
    assert "e2e" in rec["errors"]


def test_record_emits_even_when_everything_dies(monkeypatch, capsys,
                                                tmp_path):
    def dead(*a, **k):
        raise RuntimeError("nope")

    _stub_all(monkeypatch, run_e2e=dead, run_device=dead, run_train=dead,
              run_e2e_trained=dead, run_e2e_int8=dead)
    bench.run_all(_args(tmp_path))
    rec = _record(capsys)
    assert rec["value"] is None
    assert set(rec["errors"]) >= {"e2e", "device", "train", "trained",
                                  "int8"}


def test_keyboard_interrupt_still_prints_record(monkeypatch, capsys,
                                                tmp_path):
    """Ctrl-C mid-run (or the driver killing the bench) must not eat the
    already-measured numbers: the finally-print fires before the
    interrupt propagates."""

    def interrupted(a, d):
        raise KeyboardInterrupt

    _stub_all(monkeypatch, run_train=interrupted)
    with pytest.raises(KeyboardInterrupt):
        bench.run_all(_args(tmp_path))
    rec = _record(capsys)
    assert rec["value"] == 100.0
    assert rec["device_only_qa_per_sec"] == 500.0


def test_transient_classifier():
    assert bench._is_transient(RuntimeError(
        "remote_compile: read body: response body closed"))
    assert bench._is_transient(Exception("UNAVAILABLE: connection reset"))
    assert bench._is_transient(Exception("DEADLINE EXCEEDED waiting"))
    # genuine code errors must NOT be retried (they waste the round)
    assert not bench._is_transient(TypeError("bad argument"))
    assert not bench._is_transient(ValueError("shape mismatch"))
    # the closure-capture 413 is deterministic, not transient
    assert not bench._is_transient(RuntimeError(
        "HTTP 413 request body length limit exceeded"))
    # prose containing 'unavailable' without the status-code colon form
    # must not be retried (a library feature report, not a tunnel fault)
    assert not bench._is_transient(RuntimeError(
        "native tokenizer unavailable on this platform"))
    assert bench._is_transient(RuntimeError("UNAVAILABLE: backend gone"))


def test_no_int8_skips_int8_stages(monkeypatch, capsys, tmp_path):
    calls = {"n": 0}

    def count(a, d, style="short"):
        calls["n"] += 1
        return (850.0, 840.0, 950.0, 1.0, True)

    _stub_all(monkeypatch, run_e2e_int8=count)
    bench.run_all(_args(tmp_path, no_int8=True))
    rec = _record(capsys)
    assert calls["n"] == 0
    assert rec["e2e_int8_qa_per_sec"] is None
    assert rec["value"] == 100.0


def test_unmarked_long_checkpoint_is_refused_in_mode_all(
        monkeypatch, capsys, tmp_path):
    """A long-style checkpoint WITHOUT the high-acceptance provision
    marker (written by the standard short-training path) must be
    skipped with an explanatory marker, never measured: its ~zero draft
    acceptance would let the recorded spec stage silently measure pure
    verify overhead (r5 review finding)."""
    _stub_all(monkeypatch)
    args = _args(tmp_path)
    ck = _forge_long_ckpt(args, str(tmp_path), marked=False)
    bench.run_all(args)
    rec = _record(capsys)
    assert "provision marker" in rec["long_trained_skipped"]
    assert "provision marker" in rec["long_trained_spec_skipped"]
    assert rec["long_trained_qa_per_sec"] is None
    # a MARKED checkpoint at the same path runs the stages
    with open(ck + ".json", "w") as f:
        f.write('{"provision": "long-style deferred single save"}')
    bench.run_all(args)
    rec = _record(capsys)
    assert "long_trained_skipped" not in rec
    assert rec["long_trained_qa_per_sec"] == 800.0


def test_provision_long_large_uses_unified_trainer_recipe(
        monkeypatch, tmp_path):
    """provision_train_long at t5-large must train with the SAME
    single-chip recipe as the open checkpoint (_t5_large_trainer_overrides
    — scan+remat t5_overrides, bf16 AdamW moments, params-only saves),
    with provision's own epoch count and train batch, and write ONE
    provision-marked params-only checkpoint (r5: the unified recipe
    landed after the last full-suite run; pin it pure-host)."""
    import bench as bench_mod
    from multimodalpromptretrieval_tpu.train import checkpoint as ck_mod
    from multimodalpromptretrieval_tpu.train import experiment as exp_mod

    args = _args(tmp_path)
    captured: dict = {}
    saves: list = []

    def fake_setup(base, data_dir, tiny, style="short"):
        assert style == "long"
        return ({"hyperparameters": {"batch_size": 512, "epochs": 1},
                 "t5_overrides": {"attention_impl": "row"}},
                str(tmp_path / "logs"), str(tmp_path / "models"))

    class FakeExperiment:
        def __init__(self, cfg, **kw):
            captured["cfg"] = cfg
            ver = "t5-large" if cfg.get("large_leg") else "t5-small"
            base = (bench_mod._t5_large_args(args) if ver == "t5-large"
                    else args)
            self.model_path = bench_mod.trained_ckpt_path(
                base, args.data_dir, "long", ver)
            self.params = {"w": 0}

        def train(self):
            captured["trained_with"] = dict(captured["cfg"])

    monkeypatch.setattr(bench_mod, "_bench_setup", fake_setup)
    monkeypatch.setattr(exp_mod, "Experiment", FakeExperiment)
    monkeypatch.setattr(
        ck_mod, "save_checkpoint",
        lambda path, params, opt, metadata=None: saves.append(
            (path, metadata)))

    # ---- t5-large leg: the unified recipe must be present ----
    def fake_setup_large(base, data_dir, tiny, style="short"):
        cfg, lr, mr = fake_setup(base, data_dir, tiny, style)
        cfg["large_leg"] = True
        return cfg, lr, mr

    monkeypatch.setattr(bench_mod, "_bench_setup", fake_setup_large)
    out = bench_mod.provision_train_long(args, large=True)
    assert out == {"ckpt_t5_large_long": "ok"}
    cfg = captured["trained_with"]
    # trainer-only overrides replace the serving row towers wholesale
    assert cfg["t5_overrides"] == {"attention_impl": "xla", "remat": True}
    assert cfg["adamw_moments_dtype"] == "bfloat16"
    assert cfg["checkpoint_save_optimizer"] == 0
    # provision's own schedule, not the open-checkpoint epoch count
    assert cfg["hyperparameters"]["epochs"] == args.t5_large_long_epochs
    assert (cfg["hyperparameters"]["batch_size"]
            == args.t5_large_train_batch)
    assert "epochs" not in cfg  # popped before the top-level update
    # ONE deferred, provision-marked, params-only save at the gated path
    assert len(saves) == 1
    path, meta = saves[0]
    assert path == bench_mod.trained_ckpt_path(
        bench_mod._t5_large_args(args), args.data_dir, "long", "t5-large")
    assert "provision" in meta

    # ---- t5-small leg: no t5-large recipe keys may leak ----
    saves.clear()
    monkeypatch.setattr(bench_mod, "_bench_setup", fake_setup)
    out = bench_mod.provision_train_long(args, large=False)
    assert out == {"ckpt_t5_small_long": "ok"}
    cfg = captured["trained_with"]
    assert cfg["t5_overrides"] == {"attention_impl": "row"}
    assert "adamw_moments_dtype" not in cfg
    assert cfg["hyperparameters"]["epochs"] == args.long_epochs
    assert cfg["hyperparameters"]["batch_size"] == args.long_train_batch
    assert len(saves) == 1 and "provision" in saves[0][1]
