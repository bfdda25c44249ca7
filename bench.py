"""Serving / training benchmarks: SLAKE-style QA pairs/sec on one chip.

Modes (default ``all`` — one JSON line, e2e as the headline):

``e2e``    — the HONEST serving number: drives ``MPRServer.answer`` over a
             full-size synthetic SLAKE corpus with retrieval k=1 — host
             tokenize -> CLIP text embed -> fused L2 top-k -> majority
             vote + hint -> full-prompt encode -> ViT prefix + T5 encode +
             greedy decode -> host detokenize, all inside the measured
             loop (the reference pipeline, main.py:262-307; the vote/hint/
             prompt-splice stages run in-graph against a pre-tokenized
             hint table when exact — retrieval/hints.py — and the result
             is token-identical to the host pipeline). Image reuse
             mirrors SLAKE test (3 QAs/image, via MPRServer image_ids).
``device`` — the device-only pipeline (everything inside ONE jit incl.
             the in-graph retrieval->hint->prompt feedback; random ids;
             full-length decode). Upper bound.
``train``  — jitted train-step throughput (loss+grad+AdamW) at B=128.
``e2e_trained`` — steady e2e with a TRAINED checkpoint so the decode
             early-exits at EOS like a deployed server (trains once,
             cached; ``all`` includes it only when the checkpoint is
             already on disk).
``t5_large`` — t5-large open-corpus serving (fp / spec_decode=4 / int8)
             at B=128; trains + caches the t5-large checkpoint on first
             run, after which ``all`` includes the ride-along numbers.
``provision`` — cold-host rebuild (VERDICT r4 item 1): one command
             trains every checkpoint the ``all`` ride-alongs are gated
             on (t5-small short/open/long, t5-large open/long) and
             warms the persistent compile cache for every measured
             program. A cold ``all`` run now emits explicit
             ``<stage>_skipped`` markers pointing here instead of
             silently nulling the trained fields.

Mode ``all`` is crash-proof (VERDICT r3 weak #1): every stage runs
through a retry-on-transient-fault harness, failures land in an
``errors`` field, and the accumulated record is printed in a
``finally:`` — a mid-run tunnel fault yields a partial record instead of
nothing. The record also carries automatic MFU fields (train-step exact,
serve-step lower-bound) against the chip's public peak.

The reference publishes no numbers (SURVEY.md §6); the baseline is the
driver's target: 2,000 QA pairs/sec. ``vs_baseline`` = e2e value / 2000.

Run:  python bench.py            (real chip, bf16 compute)
      python bench.py --preset tiny --platform cpu   (smoke test)
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time
import traceback

# --------------------------------------------------------------------------
# Stage harness: every measurement in ``--mode all`` runs through
# _run_stage so one crashing stage can never sink the whole record
# (VERDICT r3 weak #1: the r3 round-end bench died on a transient
# remote-compile tunnel fault inside run_train, and because the single
# JSON print sat after all stages, the e2e numbers measured minutes
# earlier were thrown away with it). Transient tunnel faults — the same
# class the startup backend probe retries — are retried; terminal
# failures are recorded per-stage in an ``errors`` field and the rest of
# the record survives. run_all prints the accumulated record in a
# ``finally:`` so even KeyboardInterrupt emits a partial record.
# --------------------------------------------------------------------------

RETRIES = 2          # extra attempts per stage for transient faults
RETRY_WAIT = 60.0    # seconds between attempts (tunnel outages are long)
_TRANSIENT_MARKERS = (
    # axon tunnel / remote-compile fault surfaces observed on this host
    # (docs/TPU_NOTES.md): UNAVAILABLE swings, dropped compile bodies,
    # broken pipes. Genuine code errors (TypeError/ValueError/OOM) and
    # the closure-capture HTTP 413 do NOT match — retrying those wastes
    # the round's wall clock. "unavailable:" keeps the colon so the
    # status-code prefix form matches but prose like "tokenizer
    # unavailable" does not.
    "remote_compile", "read body", "response body", "unavailable:",
    "deadline exceeded", "connection reset", "broken pipe",
    "socket closed", "connection refused",
)


def _is_transient(exc: BaseException) -> bool:
    s = f"{type(exc).__name__}: {exc}".lower()
    return any(m in s for m in _TRANSIENT_MARKERS)


def _run_stage(name: str, fn, record: dict, errors: dict, *,
               retries: int = None, wait: float = None) -> bool:
    """Run one bench stage; merge its returned field dict into ``record``.

    Retries transient backend faults (see _TRANSIENT_MARKERS) up to
    ``retries`` extra times; any terminal failure lands in
    ``errors[name]`` (with the traceback on stderr — ADVICE r3: silent
    nulls are indistinguishable from 'no checkpoint') and returns False
    so the caller's remaining stages still run."""
    retries = RETRIES if retries is None else retries
    wait = RETRY_WAIT if wait is None else wait
    for attempt in range(retries + 1):
        try:
            out = fn()
            if out:
                record.update(out)
            return True
        except BaseException as e:
            if isinstance(e, (KeyboardInterrupt, SystemExit)):
                raise
            traceback.print_exc()
            if attempt < retries and _is_transient(e):
                print(f"# stage {name!r}: transient backend fault "
                      f"(attempt {attempt + 1}/{retries + 1}); retrying "
                      f"in {wait:.0f}s", file=sys.stderr)
                time.sleep(wait)
                continue
            errors[name] = f"{type(e).__name__}: {e}"
            return False
    return False  # unreachable; keeps type checkers honest


# --------------------------------------------------------------------------
# MFU / speed-of-light fields (VERDICT r3 item 7): the docs/TPU_NOTES.md
# ledger is hand-maintained; these derive floor-vs-measured ratios from
# the compiled HLO flop count so every recorded round tracks efficiency
# automatically.
# --------------------------------------------------------------------------


def _peak_flops():
    """Per-chip peak dense bf16 FLOP/s by device kind (public spec sheet
    numbers; the MFU denominator). None when the platform has no table
    entry (e.g. the CPU smoke preset) — MFU fields are then omitted."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peak in (("v5 lite", 197e12), ("v5e", 197e12),
                      ("v5p", 459e12), ("v6 lite", 918e12),
                      ("v6e", 918e12), ("v4", 275e12), ("v3", 123e12),
                      ("v2", 45e12)):
        if key in kind:
            return peak
    return None


def _mfu_fields(fn, fargs, sec_per_call: float, prefix: str,
                extra_flops: float = 0.0) -> dict:
    """``{prefix}_tflops_per_sec`` and ``{prefix}_mfu`` from the compiled
    program's cost analysis at the measured per-call wall time.

    XLA's HLO cost analysis counts a ``while`` body ONCE, so a program
    with a decode loop undercounts by (executed_steps - 1) bodies.
    ``extra_flops`` adds those back (ops/flops.t5_decode_step_flops —
    exact for the device bench, where early_stop=False makes the step
    count static; VERDICT r4 item 3). When extra_flops > 0 the
    body-counted-once number is also emitted as
    ``{prefix}_mfu_lower_bound`` for round-over-round continuity with
    the r3/r4 records. The train step has no while loop, so its fields
    are exact with extra_flops=0. ``lower().compile()`` hits the
    persistent compile cache, so this costs no device time."""
    peak = _peak_flops()
    if peak is None:
        return {}
    try:
        ca = fn.lower(*fargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0] if ca else None
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
    except Exception:
        traceback.print_exc()  # diagnosable, never fatal to the record
        return {}
    if flops <= 0.0 or sec_per_call <= 0.0:
        return {}
    out = {}
    if extra_flops > 0.0:
        out[f"{prefix}_mfu_lower_bound"] = round(
            flops / (sec_per_call * peak), 4)
        flops += extra_flops
    out[f"{prefix}_tflops_per_sec"] = round(flops / sec_per_call / 1e12, 2)
    out[f"{prefix}_mfu"] = round(flops / (sec_per_call * peak), 4)
    return out


def build(preset: str, dtype_name: str, batch: int, seq_len: int,
          corpus: int, k: int, decode_len: int, qa_per_image: int = 1):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalpromptretrieval_tpu.models import mprgen
    from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
    from multimodalpromptretrieval_tpu.models.t5 import (
        T5Config,
        t5_encode,
        t5_greedy_decode,
    )
    from multimodalpromptretrieval_tpu.models.clip import (
        clip_encode_text,
        clip_image_tokens,
    )
    from multimodalpromptretrieval_tpu.ops.topk import l2_topk

    import dataclasses

    if preset == "full":
        # "row": 2-D-flattened towers + row-layout Pallas attention —
        # measured faster for the ViT (~22%), the text tower (13.9 vs
        # 15.5 ms) and the T5 encoder (17.6 vs 19.6 ms) after the
        # fused-norm rework; fp32-identical (tests/test_clip_parity.py,
        # tests/test_t5_parity.py; scripts/bench_components.py)
        t5 = dataclasses.replace(T5Config.t5_small(),
                                 attention_impl="row")
        clip = dataclasses.replace(CLIPConfig.vit_b32(),
                                   attention_impl="row")
    else:
        t5 = T5Config(vocab_size=4096, d_model=128, d_kv=32, d_ff=256,
                      num_layers=2, num_decoder_layers=2, num_heads=4)
        clip = CLIPConfig(embed_dim=128, image_resolution=64,
                          vision_width=128, vision_layers=2, patch_size=16,
                          context_length=16, vocab_size=128, text_width=128,
                          vision_heads_override=2, text_heads_override=2)
    cfg = mprgen.MPRGenConfig(t5=t5, clip=clip, use_image_info=True)

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    key = jax.random.PRNGKey(0)
    params = mprgen.init_mprgen(key, cfg)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    rng = np.random.default_rng(0)
    R = clip.image_resolution
    n_img = max(1, batch // qa_per_image)
    images = jnp.asarray(
        rng.normal(size=(n_img, 3, R, R)).astype(np.float32), dtype)
    qa_to_image = jnp.asarray(
        rng.integers(0, n_img, size=(batch,)), jnp.int32)
    input_ids = jnp.asarray(rng.integers(
        2, t5.vocab_size, size=(batch, seq_len)), jnp.int32)
    text_mask = jnp.ones((batch, seq_len), jnp.int32)
    # truncated CLIP-text context: causal attention + EOT pooling make a
    # 32-token window numerically identical to the padded 77 for questions
    # that fit (SLAKE questions are ~10 words) — and ~2.4x cheaper
    clip_ctx = min(32, clip.context_length)
    clip_text_ids = jnp.asarray(rng.integers(
        1, clip.vocab_size, size=(batch, clip_ctx)), jnp.int32)
    index = jnp.asarray(rng.normal(
        size=(corpus, 2 * clip.embed_dim)).astype(np.float32))
    index_sq = jnp.sum(jnp.square(index), axis=-1)
    # pre-tokenized hint tables (retrieval/hints.py): the device pipeline
    # feeds the retrieved hint back into the prompt in-graph, so the
    # "upper bound" includes the full retrieval->prompt->decode loop
    n_ans, hint_w = 64, 8
    aid = jnp.asarray(rng.integers(0, n_ans, size=(corpus,)), jnp.int32)
    hint_ids = jnp.asarray(rng.integers(
        2, t5.vocab_size, size=(n_ans * 6, hint_w)), jnp.int32)
    hint_len = jnp.asarray(rng.integers(
        4, hint_w + 1, size=(n_ans * 6,)), jnp.int32)
    q_len = jnp.asarray(rng.integers(
        seq_len // 2, seq_len + 1, size=(batch,)), jnp.int32)

    from multimodalpromptretrieval_tpu.retrieval.hints import (
        splice_hints,
        vote_rows,
    )

    W = seq_len + hint_w + 1
    q_ids = np.zeros((batch, W), np.int32)
    q_ids[:, :seq_len] = np.asarray(input_ids)
    q_ids = jnp.asarray(q_ids)

    def serve(params, images, qa_to_image, q_ids, q_len, clip_text_ids,
              index, index_sq, aid, hint_ids, hint_len):
        # visual prefix — all 50 tokens per UNIQUE image; row 0 doubles as
        # the pooled retrieval-query image embedding (one ViT pass serves
        # both); per-QA prefixes are a gather
        tokens_u = clip_image_tokens(params["clip"], cfg.clip, images)
        tokens = tokens_u[qa_to_image]
        img_pooled = tokens[:, 0].astype(jnp.float32)
        txt_pooled = clip_encode_text(
            params["clip"], cfg.clip, clip_text_ids).astype(jnp.float32)
        query = jnp.concatenate([img_pooled, txt_pooled], axis=1)
        dists, idx = l2_topk(query, index, k, index_sq=index_sq, impl="xla")
        # retrieval feedback in-graph: majority vote + quantifier bucket,
        # hint ids spliced after the question (retrieval/hints.py)
        rows = vote_rows(aid[idx], use_quantifier=True)
        ids, mask = splice_hints(q_ids, q_len, hint_ids[rows],
                                 hint_len[rows], eos_id=1)
        prefix = tokens
        if cfg.needs_projection:
            from multimodalpromptretrieval_tpu.ops.layers import dense

            prefix = dense(prefix, params["proj"]["w"], params["proj"]["b"])
        q_emb = params["t5"]["shared"][ids]
        embeds = jnp.concatenate([prefix, q_emb], axis=1)
        B, P = ids.shape[0], prefix.shape[1]
        mask = jnp.concatenate(
            [jnp.ones((B, P), mask.dtype), mask], axis=1)
        enc = t5_encode(params["t5"], cfg.t5, embeds, mask)
        # early_stop=False: always decode the full max_new_tokens — random
        # bench weights would otherwise hit EOS after ~1 step and undercount
        out = t5_greedy_decode(params["t5"], cfg.t5, enc, mask,
                               max_new_tokens=decode_len, early_stop=False)
        return out, idx, dists

    fn = jax.jit(serve)
    args = (params, images, qa_to_image, q_ids, q_len, clip_text_ids,
            index, index_sq, aid, hint_ids, hint_len)
    # decode-loop metadata for the exact-MFU correction (ops/flops):
    # early_stop=False -> the while body runs exactly decode_len times,
    # attending over an encoder of (visual prefix + spliced prompt) rows
    meta = {"t5_cfg": t5, "decode_len": decode_len,
            "enc_len": clip.num_image_tokens + W}
    return fn, args, meta


def run_device(args):
    """Device-only QA/s (one fused jit, no host round-trips).

    Returns ``(qa_per_sec, extras)`` where extras holds the
    ``device_serve_*`` MFU fields. As of r5 the decode while-loop body
    (counted once by cost analysis) is multiplied by the
    statically-known executed step count (early_stop=False runs exactly
    decode_len bodies) via ops/flops.t5_decode_step_flops, so the
    number no longer shifts meaning with decode length (VERDICT r4
    item 3). The added bodies count ALGORITHMIC matmul FLOPs — the MFU
    convention — which on the default ``indicator`` decode-attention
    impl sit ~3% below that impl's executed FLOPs (its 0/1
    indicator dots are implementation overhead, pinned in
    tests/test_flops.py); the field is therefore exact-to-convention
    and at most ~3% conservative. The body-once number rides along as
    ``device_serve_mfu_lower_bound`` for r3/r4 continuity."""
    import numpy as np

    from multimodalpromptretrieval_tpu.ops.flops import (
        t5_decode_step_flops,
    )

    fn, fargs, meta = build(args.preset, args.dtype, args.batch,
                            args.seq_len, args.corpus, args.k,
                            args.decode_len, args.qa_per_image)
    # warmup/compile — materialize on host: on the axon (tunneled TPU)
    # platform block_until_ready returns before execution completes, so a
    # host fetch is the only reliable sync point
    np.asarray(fn(*fargs)[0])
    # keep one batch in flight: dispatch i+1 before fetching i so the host
    # round-trip overlaps device compute
    t0 = time.perf_counter()
    pending = fn(*fargs)
    for _ in range(args.iters - 1):
        nxt = fn(*fargs)
        np.asarray(pending[0])
        pending = nxt
    np.asarray(pending[0])
    dt = time.perf_counter() - t0
    body = t5_decode_step_flops(meta["t5_cfg"], args.batch,
                                meta["enc_len"], meta["decode_len"])
    extras = _mfu_fields(fn, fargs, dt / args.iters, "device_serve",
                         extra_flops=(meta["decode_len"] - 1) * body)
    return args.batch * args.iters / dt, extras


def _bench_setup(args, data_dir: str, tiny: bool, style: str = "short"):
    """(cfg, log_root, model_root) for the bench experiment — generates
    the synthetic dataset on first use but instantiates NO Experiment
    (run_e2e_trained needs the config without paying for a second full
    param set on device; t5-large OOMs otherwise).

    ``style="open"`` uses the multi-token-answer corpus
    (data/synthetic._open_qa): answers of 2-8 T5 tokens and long questions,
    so the trained early-exit decode actually pays the serial decode cost
    real SLAKE open answers incur (the short corpus early-exits after ~3
    steps and flatters the number — VERDICT r2 weak #4).

    ``style="long"`` uses the full-sentence ~13-18-token-answer corpus
    (data/synthetic._long_qa) — the speculative-decode payoff regime
    (VERDICT r4 item 2): answers run near the full max_new_tokens=20
    budget, so accepted hint drafts can cover many serial steps.
    max_target_length is raised to 24 so training never truncates."""
    from multimodalpromptretrieval_tpu.data.synthetic import (
        generate_synthetic_slake,
        synthetic_config,
    )

    size = 64 if tiny else 224
    n_train = 16 if tiny else 410       # -> 1,230 retrieval corpus entries
    n_test = 8 if tiny else args.e2e_images  # 512 imgs -> 1,536 test QAs
    sub = ("tiny" if tiny else "full") + (
        "" if style == "short" else f"_{style}")
    data_dir = os.path.join(data_dir, sub)
    marker = os.path.join(data_dir, "SLAKE", "test.json")
    if not os.path.exists(marker):
        generate_synthetic_slake(
            os.path.join(data_dir, "SLAKE"), n_train=n_train, n_validate=8,
            n_test=n_test, image_size=size, seed=0, answer_style=style)
    cfg = synthetic_config(data_dir, batch_size=args.batch if not tiny
                           else 8, epochs=1, retrieval=True, k=args.k,
                           image_size=size)
    if style == "long":
        cfg["max_target_length"] = 24
    if not tiny:  # full t5-small + ViT-B/32 (the north-star config)
        # row paths everywhere: re-measured after the fused-norm/kernel
        # default changes, row now wins the text tower (13.9 vs 15.5 ms)
        # and the T5 encoder (17.6 vs 19.6 ms) too (scripts/
        # bench_components.py, 30 iters; parity: tests/test_clip_parity,
        # tests/test_t5_parity)
        cfg["T5_version"] = getattr(args, "t5_version", "t5-small")
        cfg["t5_overrides"] = {"attention_impl": "row"}
        cfg["clip_overrides"] = {"attention_impl": "row"}
        cfg["compute_dtype"] = ("bfloat16" if args.dtype == "bf16"
                                else "float32")
    else:
        cfg["clip_overrides"]["image_resolution"] = size
    # per-version artifact roots: get_model_prefix is reference-exact and
    # does NOT encode T5_version, so without this a cached t5-small
    # checkpoint would be picked up (and fail to load) by a --t5-version
    # t5-base/t5-large run
    ver = getattr(args, "t5_version", "t5-small")
    root = data_dir if ver == "t5-small" else os.path.join(data_dir, ver)
    return cfg, os.path.join(root, "logs"), os.path.join(root, "models")


def _bench_experiment(args, data_dir: str, tiny: bool,
                      style: str = "short"):
    """A full-size (or tiny) serving Experiment over the synthetic SLAKE
    corpus, reused across runs via ``data_dir`` (see _bench_setup)."""
    from multimodalpromptretrieval_tpu.train.experiment import Experiment

    cfg, log_root, model_root = _bench_setup(args, data_dir, tiny, style)
    return Experiment(cfg, train_mode=False, quiet=True,
                      log_root=log_root, model_root=model_root)


def _steady_windows(server, questions, tasks, ids, n: int, args):
    """Measure the staged steady state over several timed windows; returns
    (best, median, pipelined_best) QA/s. The tunneled host<->device wire
    swings run-to-run (docs/TPU_NOTES.md: ~±10% across one day on
    identical code), so one window is a noisy draw.

    Serial = one blocking answer() per request (every per-call host edge
    exposed). Pipelined = submit()/result() with one request in flight,
    the way a real server drains a queue — request i+1's head (SPM
    encode) and request i's tail (fetch + detok) overlap device compute."""
    import statistics

    server.answer(None, questions, tasks, image_ids=ids)  # staged warmup
    windows = []
    for _ in range(args.e2e_windows):
        t0 = time.perf_counter()
        total = 0
        for _ in range(args.e2e_iters):
            total += len(server.answer(None, questions, tasks,
                                       image_ids=ids))
        windows.append(total / (time.perf_counter() - t0))
        assert total == n * args.e2e_iters
    pwindows = []
    for _ in range(args.e2e_windows):
        t0 = time.perf_counter()
        total = 0
        prev = None
        for _ in range(args.e2e_iters):
            h = server.submit(None, questions, tasks, image_ids=ids)
            if prev is not None:
                total += len(prev.result())
            prev = h
        total += len(prev.result())
        pwindows.append(total / (time.perf_counter() - t0))
        assert total == n * args.e2e_iters
    return max(windows), statistics.median(windows), max(pwindows)


def run_e2e_trained(args, data_dir: str, train_if_missing: bool = True,
                    style: str = "short", spec: int = 0,
                    train_batch: int = 0, length_sort: bool = False,
                    trainer_overrides=None):
    # -> (best, median, pipelined_best) QA/s, or None when no checkpoint
    # and not training
    """Steady-state QA/s with a TRAINED checkpoint and decode early-exit.

    The serving decode loop exits when every row has emitted EOS
    (t5_greedy_decode early_stop=True — exact, tested); the headline e2e
    number instead forces full-length decode because its random weights
    would stop after ~1 step and flatter the result. This mode reports
    what a deployed server sees: train briefly on the synthetic corpus
    (checkpoint cached in ``data_dir`` across runs), then measure the
    staged steady state."""
    import gc

    from multimodalpromptretrieval_tpu.serve import MPRServer
    from multimodalpromptretrieval_tpu.train.experiment import Experiment

    # Free any PREVIOUS stage's Experiment before allocating this one:
    # Experiment holds reference cycles (cached jitted closures capture
    # self), so back-to-back t5-large stages would otherwise stack two
    # multi-GB param generations in HBM until some future collection.
    gc.collect()

    tiny = args.preset == "tiny"
    cfg, log_root, model_root = _bench_setup(args, data_dir, tiny, style)
    ver = getattr(args, "t5_version", "t5-small")
    ckpt = trained_ckpt_path(args, data_dir, style, ver)
    if not os.path.exists(ckpt):
        if not train_if_missing:
            # mode "all" never trains: a cold cache would add the full
            # training wall-clock to the recorded bench run. Run
            # `bench.py --mode e2e_trained` once to create the checkpoint;
            # subsequent `all` runs then include the number.
            return None
        over = {"epochs": args.train_epochs}
        if train_batch:
            # t5-large: fwd/bwd activations at the serving batch don't
            # fit next to params + fp32 AdamW moments (~11 GB) on one
            # 16 GB chip — train smaller, serve at args.batch
            over["batch_size"] = train_batch
        tcfg = dict(cfg)
        tcfg["hyperparameters"] = dict(cfg["hyperparameters"], **over)
        if trainer_overrides:
            tover = dict(trainer_overrides)
            if "epochs" in tover:
                tcfg["hyperparameters"] = dict(
                    tcfg["hyperparameters"], epochs=tover.pop("epochs"))
            tcfg.update(tover)
        # the trainer is the ONLY experiment alive here (no serving
        # experiment first): at t5-large scale two full param sets plus
        # the optimizer moments OOM the chip (r4: RESOURCE_EXHAUSTED)
        trainer = Experiment(tcfg, train_mode=True, quiet=True,
                             log_root=log_root, model_root=model_root)
        trainer.train()
        del trainer
        # Experiment holds reference cycles (cached jitted closures
        # capture self), so a bare del leaves params + moments in HBM
        # until some future collection — force it before the serving
        # params arrive
        gc.collect()
    exp = _bench_experiment(args, data_dir, tiny=tiny, style=style)
    assert exp.model_path == ckpt, (
        f"trained_ckpt_path drifted from Experiment: {ckpt} != "
        f"{exp.model_path}")
    server = MPRServer(exp, load_checkpoint=True,
                       pipeline_depth=args.pipeline_depth,
                       spec_decode=spec, length_sort=length_sort)
    import numpy as np

    entries = exp.dataset_test.entries
    images = np.stack([exp.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    ids = [e["image_name"] for e in entries]
    n = len(entries)
    server.stage_images(images, ids)
    return _steady_windows(server, questions, tasks, ids, n, args)


def run_e2e(args, data_dir: str, style: str = "short"):
    """End-to-end QA/s through MPRServer.answer (host work measured).

    Two numbers: ``steady`` — images staged device-side once
    (MPRServer.stage_images; the SLAKE test split asks ~11 questions per
    image, so a server answers almost every request about a resident
    image), with every per-request stage in the measured loop: host
    tokenize -> CLIP text embed -> fused top-k retrieval -> majority-vote
    hint -> re-tokenize -> T5 encode + greedy decode -> host detokenize.
    ``cold`` — the same requests with nothing staged, so the unique
    images also cross host->device and run the ViT inside the loop (on
    this environment's tunneled TPU that wire runs at ~40-50 MB/s, which
    dominates; a co-located host pays ~10 ms for the same transfer —
    docs/TPU_NOTES.md)."""
    import numpy as np

    from multimodalpromptretrieval_tpu.serve import MPRServer

    exp = _bench_experiment(args, data_dir, tiny=args.preset == "tiny",
                            style=style)
    server = MPRServer(exp, load_checkpoint=False,
                       pipeline_depth=args.pipeline_depth)
    entries = exp.dataset_test.entries
    images = np.stack([exp.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    ids = [e["image_name"] for e in entries]
    n = len(entries)
    server.answer(images, questions, tasks, image_ids=ids)  # warmup/compile
    t0 = time.perf_counter()
    total = 0
    for _ in range(args.e2e_iters):
        out = server.answer(images, questions, tasks, image_ids=ids)
        total += len(out)
    cold = total / (time.perf_counter() - t0)
    assert total == n * args.e2e_iters

    server.stage_images(images, ids)
    steady, median, piped = _steady_windows(server, questions, tasks, ids,
                                            n, args)
    return steady, median, piped, cold


def run_e2e_int8(args, data_dir: str, style: str = "short"):
    """W8A8 quantized serving (MPRServer ``quantize="int8"``): steady /
    pipelined QA/s plus exact answer agreement vs the full-precision
    path on identical inputs.

    "int8" quantizes only the T5 encoder/decoder GEMMs (ops/quant), so
    retrieval ranks are identical to the fp path by construction; the
    agreement rate isolates the decode drift from the two int8 rounding
    steps. Uses the trained checkpoint when one is cached (the
    meaningful agreement measurement), random init otherwise."""
    import gc

    import numpy as np

    gc.collect()  # reclaim the previous stage's Experiment cycles first
    # (two resident t5-large param sets OOM the chip — run_e2e_trained)

    from multimodalpromptretrieval_tpu.serve import MPRServer

    exp = _bench_experiment(args, data_dir, tiny=args.preset == "tiny",
                            style=style)
    have_ckpt = os.path.exists(exp.model_path)
    q_server = MPRServer(exp, load_checkpoint=have_ckpt,
                         quantize=args.int8_mode,
                         pipeline_depth=args.pipeline_depth)
    # params are already loaded into exp by the first server (if at all);
    # the fp server reuses them without reloading
    fp_server = MPRServer(exp, load_checkpoint=False,
                          pipeline_depth=args.pipeline_depth)

    entries = exp.dataset_test.entries
    images = np.stack([exp.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    ids = [e["image_name"] for e in entries]
    n = len(entries)
    q_server.stage_images(images, ids)
    fp_server.stage_images(images, ids)
    fp_ans = fp_server.answer(None, questions, tasks, image_ids=ids)
    q_ans = q_server.answer(None, questions, tasks, image_ids=ids)
    match = sum(a == b for a, b in zip(fp_ans, q_ans)) / n
    best, median, piped = _steady_windows(q_server, questions, tasks, ids,
                                          n, args)
    return best, median, piped, match, have_ckpt


def run_train(args, data_dir: str):
    """Train-step throughput on the full-size model.

    Returns ``(examples_per_sec, extras)``; extras holds the
    ``train_step_*`` MFU fields (exact — the step has no while loop)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalpromptretrieval_tpu.models import mprgen
    from multimodalpromptretrieval_tpu.parallel import mesh as pmesh
    from multimodalpromptretrieval_tpu.train.optim import adamw_init

    exp = _bench_experiment(args, data_dir, tiny=args.preset == "tiny")
    cfg = exp.model_cfg
    B = args.train_batch if args.preset != "tiny" else 8
    rng = np.random.default_rng(0)
    R = cfg.clip.image_resolution
    batch = exp.device_batch_from({
        "images": rng.normal(size=(B, 3, R, R)).astype(np.float32),
        "input_ids": rng.integers(
            2, cfg.t5.vocab_size, size=(B, args.seq_len)).astype(np.int32),
        "text_mask": np.ones((B, args.seq_len), np.int32),
        "labels": rng.integers(2, cfg.t5.vocab_size,
                               size=(B, 8)).astype(np.int64),
    })
    # Experiment.train trains from the cached frozen-trunk tokens (the
    # vision tower is frozen, so its output is loop-invariant and computed
    # once per unique image — experiment.build_vision_token_cache); the
    # bench measures the same per-step program
    vt_step = pmesh.make_vision_tokens_step(cfg, mesh=exp.mesh)
    batch["vision_tokens"] = jax.device_put(
        vt_step(exp.params, batch.pop("images")),
        pmesh.batch_sharding(exp.mesh))
    params = exp.params
    opt_state = adamw_init(params)
    step = pmesh.make_train_step(cfg, exp.trainable, mesh=exp.mesh)
    from multimodalpromptretrieval_tpu.train.rng import dropout_key

    key = dropout_key(0)  # hardware-RNG dropout, as Experiment.train uses
    lr = jnp.float32(1e-4)
    # TWO warmup steps: the first compiles; the second absorbs the
    # one-time relowering when the donated outputs' layouts become the
    # next call's input layouts (call 0: fresh device_put layouts ->
    # call 1: compiler-chosen layouts; stable from call 2 on)
    for _ in range(2):
        params, opt_state, loss = step(params, opt_state, batch, lr, key)
        np.asarray(loss)  # sync
    t0 = time.perf_counter()
    for _ in range(args.train_iters):
        params, opt_state, loss = step(params, opt_state, batch, lr, key)
    np.asarray(loss)
    dt = time.perf_counter() - t0
    extras = _mfu_fields(step, (params, opt_state, batch, lr, key),
                         dt / args.train_iters, "train_step")
    return B * args.train_iters / dt, extras


# --------------------------------------------------------------------------
# t5-large ride-along (VERDICT r3 item 2): the measured spec-decode win
# (1.21x at B=128, docs/TPU_NOTES.md r3) lived only as a probe note —
# these stages put fp / spec4 / int8 t5-large serving into the recorded
# round-end JSON, guarded on a cached trained checkpoint (``--mode
# t5_large`` creates it once; ``all`` never trains inside a recorded run).
# --------------------------------------------------------------------------

T5_LARGE_SPEC = 4  # measured crossover: spec4 wins at t5-large depth


def _t5_large_args(args):
    la = copy.copy(args)
    la.t5_version = "t5-large"
    la.batch = args.t5_large_batch
    return la


def _t5_large_trainer_overrides(args) -> dict:
    """Config overrides for TRAINING a t5-large checkpoint on one chip
    (shared by ``--mode t5_large`` and ``--mode provision``)."""
    return {
        # scan-over-layers for the TRAINER only: the row path statically
        # unrolls 24+24 layers, and the t5-large fwd+bwd program stalled
        # the tunnel's remote-compile service for 70+ min (r4 measured);
        # the scan HLO is depth-independent and numerics-identical.
        # remat: per-layer rematerialization — without it the B=32
        # fwd+bwd wants 8.26 GB of HLO temps next to 9.9 GB of
        # params+moments (XLA OOM report, r4). Serving (the measured
        # side) keeps the fast row towers, no remat.
        "t5_overrides": {"attention_impl": "xla", "remat": True},
        # drop AdamW moments from the checkpoint: serving never reads
        # them and their device->host fetch is ~6 GB per save through a
        # 10-25 MB/s tunnel
        "checkpoint_save_optimizer": 0,
        # bf16 moment storage (fp32 math — train/optim.py): halves the
        # ~5.9 GB of fp32 mu/nu, which is what lets the trainer fit
        # B=64 (fp32 moments OOM at B=64 — r5 probe,
        # scripts/probe_t5large_moments.py: 269 ex/s at B=32 fp32 vs
        # 346 ex/s at B=64 bf16, +29%)
        "adamw_moments_dtype": "bfloat16",
        "epochs": args.t5_large_epochs,
    }


def trained_ckpt_path(args, data_dir: str, style: str, ver: str) -> str:
    """The e2e_trained checkpoint path WITHOUT instantiating an
    Experiment (a t5-large init would allocate GBs of params just to
    probe a path). Mirrors _bench_experiment's per-style, per-version
    artifact roots and Experiment's ``get_model_prefix`` naming."""
    from multimodalpromptretrieval_tpu.data.synthetic import (
        synthetic_config,
    )
    from multimodalpromptretrieval_tpu.utils import get_model_prefix

    sub = (("tiny" if args.preset == "tiny" else "full")
           + ("" if style == "short" else f"_{style}"))
    root = os.path.join(data_dir, sub)
    if ver != "t5-small":
        root = os.path.join(root, ver)
    cfg = synthetic_config(os.path.join(data_dir, "unused"),
                           retrieval=True, k=args.k)
    return os.path.join(root, "models", get_model_prefix(cfg) + ".npz")


def run_t5_large(args, data_dir: str, train_if_missing: bool = False):
    """t5-large open-corpus serving: trained fp, spec_decode=4, int8.

    B defaults to 128 (``--t5-large-batch``) — the batch where the spec4
    decode win was measured (the cross-attention KV caches scale with
    layers * d_model, so t5-small's B=512 does not fit the same way).
    The 512->1024 visual projection leg is reference behavior
    (T5VisionModel.py:49-51), not an extra."""
    la = _t5_large_args(args)
    style = "open"
    if not train_if_missing and not os.path.exists(
            trained_ckpt_path(la, data_dir, style, "t5-large")):
        return {"t5_large_skipped": _PROVISION_HINT}
    fields = {}
    trainer_overrides = _t5_large_trainer_overrides(args)
    out = run_e2e_trained(la, data_dir, train_if_missing=train_if_missing,
                          style=style, train_batch=args.t5_large_train_batch,
                          trainer_overrides=trainer_overrides)
    fields["t5_large_trained_qa_per_sec"] = round(out[0], 2)
    fields["t5_large_trained_pipelined_qa_per_sec"] = round(out[2], 2)
    outs = run_e2e_trained(la, data_dir, train_if_missing=False,
                           style=style, spec=T5_LARGE_SPEC)
    fields["t5_large_spec4_qa_per_sec"] = round(outs[0], 2)
    fields["t5_large_spec4_pipelined_qa_per_sec"] = round(outs[2], 2)
    if not args.no_int8:
        i8 = run_e2e_int8(la, data_dir, style=style)
        fields["t5_large_int8_pipelined_qa_per_sec"] = round(i8[2], 2)
        fields["t5_large_int8_answer_match_vs_fp"] = round(i8[3], 4)
    return fields


# Pre-seeded ``all`` record schema: every expected field starts as None so
# a partial record (stage crash) still shows WHICH numbers are missing
# rather than silently omitting keys.
_ALL_FIELDS = (
    "e2e_median_of_windows", "e2e_pipelined_qa_per_sec",
    "e2e_cold_images_over_wire",
    "e2e_trained_earlystop_qa_per_sec", "e2e_trained_median_of_windows",
    "e2e_trained_pipelined_qa_per_sec",
    "e2e_int8_qa_per_sec", "e2e_int8_pipelined_qa_per_sec",
    "int8_answer_match_vs_fp", "int8_used_trained_checkpoint",
    "open_e2e_qa_per_sec", "open_e2e_pipelined_qa_per_sec",
    "open_trained_qa_per_sec", "open_trained_pipelined_qa_per_sec",
    "open_trained_length_sort_qa_per_sec",
    "open_trained_length_sort_pipelined_qa_per_sec",
    "long_trained_qa_per_sec", "long_trained_pipelined_qa_per_sec",
    "long_trained_spec_decode_qa_per_sec",
    "long_trained_spec_decode_pipelined_qa_per_sec",
    "open_int8_pipelined_qa_per_sec", "open_int8_answer_match_vs_fp",
    "open_int8_used_trained_checkpoint",
    "t5_large_trained_qa_per_sec", "t5_large_trained_pipelined_qa_per_sec",
    "t5_large_long_trained_qa_per_sec",
    "t5_large_long_trained_pipelined_qa_per_sec",
    "t5_large_long_spec4_qa_per_sec",
    "t5_large_long_spec4_pipelined_qa_per_sec",
    "t5_large_int8_pipelined_qa_per_sec",
    "t5_large_int8_answer_match_vs_fp",
    "device_only_qa_per_sec", "train_ex_per_sec",
)

# Every checkpoint-gated stage emits this marker instead of silently
# returning nothing when its cached checkpoint is missing (VERDICT r4
# weak #1: this host wipes ~/.cache between sessions, and a cold-host
# record used to lose its trained/t5-large fields with no trace).
_PROVISION_HINT = ("no cached checkpoint; run "
                   "`python bench.py --mode provision` once")

BASELINE_QA_PER_SEC = 2000.0  # the driver's north-star target (BASELINE.md)


def run_all(args) -> None:
    """``--mode all``: steady-state e2e is the headline; every other
    number rides along. Each stage runs through :func:`_run_stage`
    (retry transient faults, record terminal ones) and the accumulated
    record is printed in a ``finally:`` — a mid-run tunnel fault now
    yields a partial record with an ``errors`` field instead of nothing
    (VERDICT r3 weak #1). If the e2e headline itself died, the headline
    value falls back to the best surviving stage (flagged via
    ``headline_fallback_from``)."""
    baseline = BASELINE_QA_PER_SEC
    record = {"metric": "slake_serve_qa_pairs_per_sec_e2e", "value": None,
              "unit": "QA/s", "vs_baseline": None}
    record.update({f: None for f in _ALL_FIELDS})
    errors: dict = {}

    def e2e_fields():
        steady, median, piped, cold = run_e2e(args, args.data_dir)
        return {"value": round(steady, 2),
                "vs_baseline": round(steady / baseline, 4),
                "e2e_median_of_windows": round(median, 2),
                "e2e_pipelined_qa_per_sec": round(piped, 2),
                "e2e_cold_images_over_wire": round(cold, 2)}

    def device_fields():
        v, extras = run_device(args)
        return {"device_only_qa_per_sec": round(v, 2), **extras}

    def train_fields():
        v, extras = run_train(args, args.data_dir)
        return {"train_ex_per_sec": round(v, 2), **extras}

    def open_e2e_fields():
        # the multi-token-answer corpus (VERDICT r2 item 2): same
        # pipeline, answers of 2-8 T5 tokens + long questions — where the
        # serial decode costs what real SLAKE open answers cost
        steady, _, piped, _ = run_e2e(args, args.data_dir, style="open")
        return {"open_e2e_qa_per_sec": round(steady, 2),
                "open_e2e_pipelined_qa_per_sec": round(piped, 2)}

    def trained_fields():
        out = run_e2e_trained(args, args.data_dir, train_if_missing=False)
        if out is None:  # cold host: self-diagnosing marker, not a null
            return {"trained_skipped": _PROVISION_HINT}
        return {"e2e_trained_earlystop_qa_per_sec": round(out[0], 2),
                "e2e_trained_median_of_windows": round(out[1], 2),
                "e2e_trained_pipelined_qa_per_sec": round(out[2], 2)}

    def open_trained_fields():
        out = run_e2e_trained(args, args.data_dir, train_if_missing=False,
                              style="open")
        if out is None:
            return {"open_trained_skipped": _PROVISION_HINT}
        return {"open_trained_qa_per_sec": round(out[0], 2),
                "open_trained_pipelined_qa_per_sec": round(out[2], 2)}

    def open_trained_lsort_fields():
        # answer-length-aware chunk composition (VERDICT r3 item 3):
        # retrieval pre-pass predicts answer lengths, chunks re-composed
        # so short-answer chunks hit all-rows-EOS early. Recorded
        # alongside the unsorted number so the win/loss is in the record.
        out = run_e2e_trained(args, args.data_dir, train_if_missing=False,
                              style="open", length_sort=True)
        if out is None:
            return {"open_trained_lsort_skipped": _PROVISION_HINT}
        return {"open_trained_length_sort_qa_per_sec": round(out[0], 2),
                "open_trained_length_sort_pipelined_qa_per_sec":
                    round(out[2], 2)}

    # Speculative decode's recorded verdict lives in the LONG-answer
    # corpus stages below — its claimed payoff regime (VERDICT r4 item
    # 2). The r3/r4 short/open-corpus spec stages were settled recorded
    # NEGATIVES (open 4,061 vs 5,589 QA/s; t5-large open 496 vs 921 —
    # BENCH_r04.json) and are no longer re-measured every round; the
    # feature stays opt-in (--spec-decode) and fully tested.

    def _long_not_ready(ver: str):
        """None when the long-style checkpoint exists AND carries the
        high-acceptance provision marker; otherwise the skip reason.
        The regime gate must sit here, not only in provision: a long
        checkpoint from the standard short-training path (e.g. `--mode
        e2e_trained --corpus-style long`) would otherwise let the
        recorded spec stage silently measure the EM-2%/zero-acceptance
        model (r5 review finding)."""
        base = _t5_large_args(args) if ver == "t5-large" else args
        ck = trained_ckpt_path(base, args.data_dir, "long", ver)
        if not os.path.exists(ck):
            return _PROVISION_HINT
        if not _is_high_acceptance_ckpt(ck):
            return ("long checkpoint exists but lacks the "
                    "high-acceptance provision marker (short-trained "
                    "regime); run `python bench.py --mode provision` "
                    "to retrain it")
        return None

    def long_trained_fields():
        why = _long_not_ready("t5-small")
        if why:
            return {"long_trained_skipped": why}
        out = run_e2e_trained(args, args.data_dir, train_if_missing=False,
                              style="long")
        return {"long_trained_qa_per_sec": round(out[0], 2),
                "long_trained_pipelined_qa_per_sec": round(out[2], 2)}

    def long_trained_spec_fields():
        why = _long_not_ready("t5-small")
        if why:
            return {"long_trained_spec_skipped": why}
        out = run_e2e_trained(args, args.data_dir, train_if_missing=False,
                              style="long", spec=4)
        return {"long_trained_spec_decode_qa_per_sec": round(out[0], 2),
                "long_trained_spec_decode_pipelined_qa_per_sec":
                    round(out[2], 2)}

    def int8_fields():
        i8 = run_e2e_int8(args, args.data_dir)
        return {"e2e_int8_qa_per_sec": round(i8[0], 2),
                "e2e_int8_pipelined_qa_per_sec": round(i8[2], 2),
                "int8_answer_match_vs_fp": round(i8[3], 4),
                "int8_used_trained_checkpoint": i8[4]}

    def open_int8_fields():
        i8 = run_e2e_int8(args, args.data_dir, style="open")
        return {"open_int8_pipelined_qa_per_sec": round(i8[2], 2),
                "open_int8_answer_match_vs_fp": round(i8[3], 4),
                "open_int8_used_trained_checkpoint": i8[4]}

    def t5l_fp_fields():
        out = run_e2e_trained(_t5_large_args(args), args.data_dir,
                              train_if_missing=False, style="open")
        if out is None:
            return {"t5_large_skipped": _PROVISION_HINT}
        return {"t5_large_trained_qa_per_sec": round(out[0], 2),
                "t5_large_trained_pipelined_qa_per_sec": round(out[2], 2)}

    def t5l_long_fp_fields():
        out = run_e2e_trained(_t5_large_args(args), args.data_dir,
                              train_if_missing=False, style="long")
        if out is None:
            return {"t5_large_long_skipped": _PROVISION_HINT}
        return {"t5_large_long_trained_qa_per_sec": round(out[0], 2),
                "t5_large_long_trained_pipelined_qa_per_sec":
                    round(out[2], 2)}

    def t5l_long_spec_fields():
        out = run_e2e_trained(_t5_large_args(args), args.data_dir,
                              train_if_missing=False, style="long",
                              spec=T5_LARGE_SPEC)
        if out is None:
            return {"t5_large_long_spec_skipped": _PROVISION_HINT}
        return {"t5_large_long_spec4_qa_per_sec": round(out[0], 2),
                "t5_large_long_spec4_pipelined_qa_per_sec":
                    round(out[2], 2)}

    def t5l_int8_fields():
        i8 = run_e2e_int8(_t5_large_args(args), args.data_dir,
                          style="open")
        return {"t5_large_int8_pipelined_qa_per_sec": round(i8[2], 2),
                "t5_large_int8_answer_match_vs_fp": round(i8[3], 4)}

    def _have_ckpt(style: str, ver: str) -> bool:
        try:
            base = _t5_large_args(args) if ver == "t5-large" else args
            return os.path.exists(trained_ckpt_path(
                base, args.data_dir, style, ver))
        except Exception:
            traceback.print_exc()
            return False

    try:
        _run_stage("e2e", e2e_fields, record, errors)
        _run_stage("device", device_fields, record, errors)
        _run_stage("train", train_fields, record, errors)
        _run_stage("open_e2e", open_e2e_fields, record, errors)
        _run_stage("trained", trained_fields, record, errors)
        _run_stage("open_trained", open_trained_fields, record, errors)
        _run_stage("open_trained_lsort", open_trained_lsort_fields,
                   record, errors)
        _run_stage("long_trained", long_trained_fields, record, errors)
        _run_stage("long_trained_spec", long_trained_spec_fields, record,
                   errors)
        if not args.no_int8:
            _run_stage("int8", int8_fields, record, errors)
            _run_stage("open_int8", open_int8_fields, record, errors)
        if _have_ckpt("open", "t5-large"):
            _run_stage("t5_large_fp", t5l_fp_fields, record, errors)
            if not args.no_int8:
                _run_stage("t5_large_int8", t5l_int8_fields, record,
                           errors)
        else:
            record["t5_large_skipped"] = _PROVISION_HINT
        try:
            t5l_long_why = _long_not_ready("t5-large")
        except Exception:
            traceback.print_exc()
            t5l_long_why = _PROVISION_HINT
        if t5l_long_why is None:
            _run_stage("t5_large_long_fp", t5l_long_fp_fields, record,
                       errors)
            _run_stage("t5_large_long_spec", t5l_long_spec_fields,
                       record, errors)
        else:
            record["t5_large_long_skipped"] = t5l_long_why
    finally:
        if record.get("value") is None:
            # the headline stage itself died after retries: promote the
            # best surviving serving number so the record still carries a
            # meaningful (flagged) headline
            for key in ("e2e_trained_earlystop_qa_per_sec",
                        "open_trained_qa_per_sec",
                        "device_only_qa_per_sec"):
                v = record.get(key)
                if v is not None:  # 0.0 is a measurement, not a gap
                    record["value"] = v
                    record["vs_baseline"] = round(v / baseline, 4)
                    record["headline_fallback_from"] = key
                    break
        if errors:
            record["errors"] = errors
        print(json.dumps(record), flush=True)


def _is_high_acceptance_ckpt(ckpt_path: str) -> bool:
    """True iff the checkpoint's metadata sidecar carries the
    provision_train_long marker (the high-acceptance long-regime
    training). A long-style checkpoint created by the standard
    short-training path has epoch/valid_loss metadata but no
    ``provision`` key."""
    try:
        with open(ckpt_path + ".json") as f:
            return "provision" in json.load(f)
    except Exception:
        return False


def provision_train_long(args, large: bool) -> dict:
    """Train a LONG-corpus checkpoint to the high-draft-acceptance regime
    (provision only).

    The long corpus exists to give speculative decode its claimed payoff
    regime a recorded verdict (VERDICT r4 item 2) — that requires a
    model that actually REPRODUCES the retrieved drafts. The standard
    8-epoch bench training (~24 updates) yields fluent but
    content-confused answers (EM 2.1%, draft acceptance ~0), which would
    make the recorded spec stage measure pure verify overhead. The
    regime probe (scripts/probe_spec_regime.py, docs/TPU_NOTES.md r5)
    measured 60 epochs at B=128 reaching 86% draft acceptance in ~128 s
    of device time — but the standard train loop saves a ~0.8-1.3 GB
    checkpoint on every best-validation epoch through a ~14 MB/s tunnel
    (~25 min of fetches at this epoch count). So long-style provisioning
    trains IN-PROCESS with the per-epoch saves patched out and writes
    ONE params-only checkpoint at the end (last-epoch params rather than
    best-validation — equivalent on this monotonically-converging toy
    corpus, and serving is what the checkpoint is for). The short/open
    checkpoints keep the reference-semantics training path.
    """
    import gc

    from multimodalpromptretrieval_tpu.train import checkpoint as ck_mod
    from multimodalpromptretrieval_tpu.train.experiment import Experiment

    gc.collect()  # never hold two experiments' params (r4 OOM lesson)
    base = _t5_large_args(args) if large else args
    ver = getattr(base, "t5_version", "t5-small")
    name = "ckpt_" + ("t5_large" if large else "t5_small") + "_long"
    ckpt = trained_ckpt_path(base, args.data_dir, "long", ver)
    if os.path.exists(ckpt) and _is_high_acceptance_ckpt(ckpt):
        return {name: "ok"}
    # a long checkpoint WITHOUT the provision marker came from the
    # standard short-training path (e.g. `--mode e2e_trained
    # --corpus-style long`) — the EM-2%/zero-acceptance regime whose
    # spec numbers measure pure verify overhead. Retrain; never let the
    # recorded regime stage silently measure the wrong model (r5 review
    # sweep finding #2).
    tiny = args.preset == "tiny"
    cfg, log_root, model_root = _bench_setup(base, args.data_dir, tiny,
                                             "long")
    over = {"epochs": (args.t5_large_long_epochs if large
                       else args.long_epochs)}
    over["batch_size"] = (args.t5_large_train_batch if large
                          else args.long_train_batch)
    tcfg = dict(cfg)
    tcfg["hyperparameters"] = dict(cfg["hyperparameters"], **over)
    if large:  # the same single-chip trainer recipe as the open ckpt
        tover = _t5_large_trainer_overrides(args)
        tover.pop("epochs")  # provision sets its own epoch count above
        tcfg.update(tover)
    saved = ck_mod.save_checkpoint
    ck_mod.save_checkpoint = lambda *a, **k: None
    try:
        tr = Experiment(tcfg, train_mode=True, quiet=True,
                        log_root=log_root, model_root=model_root)
        tr.train()
    finally:
        ck_mod.save_checkpoint = saved
    assert tr.model_path == ckpt, (tr.model_path, ckpt)
    ck_mod.save_checkpoint(ckpt, tr.params, None, metadata={
        "provision": "long-style deferred single save (params only)",
        "epochs": over["epochs"], "config": tcfg})
    del tr
    gc.collect()
    return {name: "ok"}


def run_provision(args) -> None:
    """``--mode provision``: one command rebuilds EVERYTHING a recorded
    ``--mode all`` run needs on a cold host (VERDICT r4 item 1).

    This host wipes ~/.cache (and every non-repo path) between sessions,
    and ``--mode all`` deliberately never trains — so without this, a
    cold round-end driver run silently nulls every trained/t5-large
    field. Provision builds, in order: the synthetic corpora, every
    trained checkpoint the ride-along stages are gated on (t5-small
    short/open/long; t5-large open/long with the single-chip trainer
    overrides), then runs a minimal-iteration ``--mode all`` pass so
    every measured program lands in the persistent compile cache
    (.jax_cache). Each step runs through the transient-fault retry
    harness; the summary JSON line reports what was provisioned and any
    terminal errors. Budget ~40-60 min cold, seconds when warm.
    """
    record = {"metric": "bench_provision", "value": None, "unit": "stages",
              "vs_baseline": None}
    done: dict = {}
    errors: dict = {}

    def ckpt(style: str, large: bool):
        def fn():
            if large:
                out = run_e2e_trained(
                    _t5_large_args(args), args.data_dir,
                    train_if_missing=True, style=style,
                    train_batch=args.t5_large_train_batch,
                    trainer_overrides=_t5_large_trainer_overrides(args))
            else:
                out = run_e2e_trained(args, args.data_dir,
                                      train_if_missing=True, style=style)
            name = "ckpt_" + ("t5_large" if large else "t5_small") \
                + "_" + style
            return {name: "ok" if out is not None else "missing"}
        return fn

    def warm():
        # run the real stage loop at minimal iteration counts so every
        # program ``--mode all`` measures is compiled into the
        # persistent cache; the warm-run record goes to stderr (the
        # driver contract is ONE stdout JSON line per invocation)
        import contextlib
        import io

        wa = copy.copy(args)
        wa.iters, wa.train_iters = 2, 2
        wa.e2e_iters, wa.e2e_windows = 1, 1
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            run_all(wa)
        print("# provision warm-run record: " + buf.getvalue().strip(),
              file=sys.stderr)
        return {"warmed_all_programs": True}

    try:
        _run_stage("ckpt_t5_small_short", ckpt("short", False), done,
                   errors)
        _run_stage("ckpt_t5_small_open", ckpt("open", False), done, errors)
        # long-style checkpoints: high-acceptance training with ONE
        # deferred save (provision_train_long docstring)
        _run_stage("ckpt_t5_small_long",
                   lambda: provision_train_long(args, False), done,
                   errors)
        if args.preset != "tiny":  # tiny = CPU smoke; no t5-large dims
            _run_stage("ckpt_t5_large_open", ckpt("open", True), done,
                       errors)
            _run_stage("ckpt_t5_large_long",
                       lambda: provision_train_long(args, True), done,
                       errors)
        _run_stage("warm_all", warm, done, errors)
    finally:
        record["provisioned"] = done
        record["value"] = sum(v == "ok" or v is True for v in done.values())
        if errors:
            record["errors"] = errors
        print(json.dumps(record), flush=True)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="all",
                   choices=["all", "e2e", "e2e_trained", "e2e_int8",
                            "device", "train", "t5_large", "provision"])
    p.add_argument("--t5-large-batch", type=int, default=128,
                   help="t5-large stages: serve batch (128 = the batch "
                        "where the spec4 decode win was measured; the "
                        "cross-KV caches scale with layers*d_model)")
    p.add_argument("--t5-large-train-batch", type=int, default=64,
                   help="t5-large checkpoint training batch: 64 fits "
                        "with the recipe's bf16 AdamW moments and runs "
                        "+29%% over the old fp32 B=32 recipe (fp32 "
                        "moments OOM at B=64; B=128 doesn't fit either "
                        "way on a 16 GB chip — "
                        "scripts/probe_t5large_moments.py)")
    p.add_argument("--long-epochs", type=int, default=60,
                   help="provision: t5-small long-corpus training epochs "
                        "(60 reaches ~86%% draft acceptance — the "
                        "spec-decode regime measurement needs it; "
                        "scripts/probe_spec_regime.py)")
    p.add_argument("--long-train-batch", type=int, default=128,
                   help="provision: t5-small long-corpus training batch "
                        "(128 -> ~9 updates/epoch on the 1,230-QA "
                        "corpus)")
    p.add_argument("--t5-large-long-epochs", type=int, default=15,
                   help="provision: t5-large long-corpus training epochs "
                        "(B=32 -> ~38 updates/epoch, so 15 epochs ~ the "
                        "~570 updates the t5-small acceptance probe "
                        "needed; saves are deferred to one final "
                        "params-only write)")
    p.add_argument("--t5-large-epochs", type=int, default=2,
                   help="t5-large checkpoint training epochs: 2 epochs "
                        "at B=32 = ~78 updates, plenty for the synthetic "
                        "corpus (t5-small's checkpoint trains on ~24 "
                        "updates), and each improved-validation save "
                        "fetches ~3.5 GB of params through the tunnel")
    p.add_argument("--no-int8", action="store_true",
                   help="all: skip the quantized-serving measurement")
    p.add_argument("--int8-mode", default="int8",
                   choices=["int8", "int8_all"],
                   help="e2e_int8: T5-only (retrieval-exact) or +CLIP")
    p.add_argument("--t5-version", default="t5-small",
                   choices=["t5-small", "t5-base", "t5-large"],
                   help="full preset T5 size (t5-large engages the "
                        "512->1024 visual projection; use a smaller "
                        "--batch: the cross-KV caches scale with "
                        "layers*d_model)")
    p.add_argument("--preset", default="full", choices=["full", "tiny"])
    p.add_argument("--length-sort", action="store_true",
                   help="e2e_trained: re-chunk requests by predicted "
                        "answer length (retrieval pre-pass; "
                        "serve.MPRServer length_sort)")
    p.add_argument("--spec-decode", type=int, default=0,
                   help="e2e_trained: hint-draft speculative decode block "
                        "size (0 = lockstep greedy; outputs identical "
                        "either way — models/t5.t5_spec_greedy_decode)")
    p.add_argument("--corpus-style", default="short",
                   choices=["short", "open", "long"],
                   help="e2e/e2e_trained/e2e_int8 corpus: 'open' uses "
                        "multi-token answers (2-8 T5 tokens) + long "
                        "questions so trained early-exit decode pays the "
                        "real serial cost; 'long' uses full-sentence "
                        "~13-18-token answers (the spec-decode payoff "
                        "regime); mode 'all' measures all of them")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--seq-len", type=int, default=32)
    p.add_argument("--corpus", type=int, default=4919)  # SLAKE en train size
    p.add_argument("--k", type=int, default=1)
    p.add_argument("--decode-len", type=int, default=20)
    p.add_argument("--qa-per-image", type=int, default=8,
                   help="device mode: QA pairs sharing one image")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--e2e-iters", type=int, default=3)
    p.add_argument("--e2e-windows", type=int, default=3,
                   help="steady-state windows; best + median reported")
    p.add_argument("--e2e-images", type=int, default=512)
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="serve chunks allowed in flight (MPRServer). "
                        "Swept on-chip 2026-08: depth 2 beats 1 by +41%% "
                        "on the trained path (9,804 vs 6,957 QA/s — the "
                        "~26 ms per-fetch tunnel RT stalls depth 1); "
                        "depth 3 regresses (8,746)")
    p.add_argument("--train-batch", type=int, default=128)
    p.add_argument("--train-iters", type=int, default=30)
    p.add_argument("--train-epochs", type=int, default=8,
                   help="e2e_trained: epochs before measuring early-exit")
    # persistent by default: /tmp has been wiped between sessions on this
    # host (r2/r4 logs), and a wiped data dir silently nulls every
    # trained-checkpoint field in the recorded round-end run
    p.add_argument("--data-dir",
                   default=os.path.expanduser("~/.cache/mpr_bench_data"))
    p.add_argument("--platform", default=None)
    return p


def main():
    args = build_parser().parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    # persistent compile cache: the tunneled-TPU first compile is minutes;
    # cache it across bench runs (repo-local so it survives /tmp cleanup)
    import os as _os

    cache_dir = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                              ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # The tunneled TPU backend occasionally fails/hangs at init
    # (UNAVAILABLE swings, docs/TPU_NOTES.md) — probe it with retries so a
    # transient outage doesn't sink a recorded bench run. Each probe runs
    # in a subprocess because a hung in-process init can't be cancelled.
    import subprocess
    import sys as _sys

    # env vars are too late (the sitecustomize pre-imports jax), so the
    # probe pins the platform the way main.py --platform does
    probe = "import jax; "
    if args.platform:
        probe += f"jax.config.update('jax_platforms', '{args.platform}'); "
    probe += "jax.devices()"
    for attempt in range(10):
        try:
            r = subprocess.run([_sys.executable, "-c", probe],
                               capture_output=True, timeout=180)
            if r.returncode == 0:
                break
        except subprocess.TimeoutExpired:
            pass
        if attempt == 9:
            break  # last resort: run anyway and let the real error surface
        print(f"# backend probe failed (attempt {attempt + 1}/10); "
              "retrying in 60s", file=_sys.stderr)
        time.sleep(60)

    baseline = BASELINE_QA_PER_SEC
    if args.mode == "device":
        v, extras = run_device(args)
        print(json.dumps({
            "metric": "slake_serve_qa_pairs_per_sec", "value": round(v, 2),
            "unit": "QA/s", "vs_baseline": round(v / baseline, 4),
            **extras}))
    elif args.mode == "e2e":
        steady, median, piped, cold = run_e2e(args, args.data_dir,
                                              style=args.corpus_style)
        print(json.dumps({
            "metric": "slake_serve_qa_pairs_per_sec_e2e",
            "value": round(steady, 2),
            "unit": "QA/s", "vs_baseline": round(steady / baseline, 4),
            "e2e_median_of_windows": round(median, 2),
            "e2e_pipelined_qa_per_sec": round(piped, 2),
            "e2e_cold_images_over_wire": round(cold, 2)}))
    elif args.mode == "e2e_trained":
        best, median, piped = run_e2e_trained(args, args.data_dir,
                                              style=args.corpus_style,
                                              spec=args.spec_decode,
                                              length_sort=args.length_sort)
        print(json.dumps({
            "metric": "slake_serve_qa_pairs_per_sec_e2e_trained",
            "value": round(best, 2), "unit": "QA/s",
            "vs_baseline": round(best / baseline, 4),
            "e2e_trained_median_of_windows": round(median, 2),
            "e2e_trained_pipelined_qa_per_sec": round(piped, 2)}))
    elif args.mode == "train":
        v, extras = run_train(args, args.data_dir)
        print(json.dumps({
            "metric": "train_examples_per_sec", "value": round(v, 2),
            "unit": "ex/s", "vs_baseline": None, **extras}))
    elif args.mode == "t5_large":
        fields = run_t5_large(args, args.data_dir, train_if_missing=True)
        v = fields.pop("t5_large_trained_qa_per_sec", None)
        print(json.dumps({
            "metric": "slake_serve_qa_pairs_per_sec_t5_large_trained",
            "value": v, "unit": "QA/s",
            "vs_baseline": (round(v / baseline, 4) if v is not None
                            else None),
            **fields}))
    elif args.mode == "provision":
        run_provision(args)
    elif args.mode == "e2e_int8":
        best, median, piped, match, trained = run_e2e_int8(
            args, args.data_dir, style=args.corpus_style)
        print(json.dumps({
            "metric": "slake_serve_qa_pairs_per_sec_e2e_int8",
            "value": round(best, 2), "unit": "QA/s",
            "vs_baseline": round(best / baseline, 4),
            "e2e_int8_median_of_windows": round(median, 2),
            "e2e_int8_pipelined_qa_per_sec": round(piped, 2),
            "int8_answer_match_vs_fp": round(match, 4),
            "int8_used_trained_checkpoint": trained}))
    else:  # all: the crash-proof stage loop (run_all)
        run_all(args)


if __name__ == "__main__":
    main()
