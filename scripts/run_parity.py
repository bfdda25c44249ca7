"""Cross-framework accuracy parity run: this framework vs the reference.

For each model variant (generative / frozen / prediction-head / BAN —
the four classes main.py:132-146 can construct), trains the JAX
framework on the hermetic synthetic SLAKE corpus, exports the trained
weights into the reference's checkpoint format, then runs the ACTUAL
reference driver (/root/reference/main.py, torch CPU, via
scripts/ref_driver.py shims) in --test mode on the same data and
weights, and diffs the metric tables and per-question outcomes.

Identical weights + identical tokenizers + identical data => the two
frameworks must produce the same accuracy tables; any divergence is a
numerics/semantics bug. Writes PARITY_RUN.md at the repo root.

The head/BAN variants run with d_model=512: the reference hardcodes its
prediction head and BAN dims to 512 (T5VisionModelPredictionHead.py:25,
T5VisionModelPredictionHeadBAN.py:84-86), so a smaller tiny config
cannot be loaded by the reference's own classes.

Usage:  python scripts/run_parity.py [--workdir DIR] [--epochs N]
        [--retrieval] [--variant all|generative|frozen|head|ban] [--keep]
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

VARIANTS = ("generative", "frozen", "head", "ban", "transfer")

# config-key overlay per variant, mirroring the reference's class
# selection (main.py:132-146). glimpse is listed for the record; both
# sides hardcode 10 (quirk #9). "transfer" is the generative class
# evaluated zero-shot on VQA_RAD (main.py:67-69: at --test every split
# comes from transfer_dataset while the retrieval corpus stays
# retrieval_dataset = the training SLAKE).
_OVERLAY = {
    "generative": {},
    "frozen": {"freeze": 1},
    "head": {"use_prediction_head": 1},
    "ban": {"use_prediction_head": 1, "use_BAN": 1, "glimpse": 10},
    "transfer": {"transfer_dataset": "VQA_RAD",
                 "retrieval_dataset": "SLAKE"},
}


def log(msg):
    print(f"[parity] {msg}", flush=True)


def parse_report(text):
    """Pull the accuracy tables out of a reference-format test report."""
    out = {"tasks": {}, "open": None, "closed": None, "overall": None,
           "retrieval": []}
    for m in re.finditer(r"^(\w[\w ]*): (\d+\.\d)$", text, re.M):
        key, val = m.group(1), float(m.group(2))
        if key == "Open":
            out["open"] = val
        elif key == "Closed":
            out["closed"] = val
        elif not (key == "Overall accuracy"
                  or key.startswith(("Percentage of", "How often"))):
            out["tasks"][key] = val
    m = re.search(r"Overall accuracy: (\d+\.\d)", text)
    if m:
        out["overall"] = float(m.group(1))
    for m in re.finditer(r"^(Percentage of .*|How often .*): (\d+\.\d)$",
                         text, re.M):
        out["retrieval"].append((m.group(1), float(m.group(2))))
    return out


def run_variant(args, wd, variant):
    """Train/test both frameworks for one variant under ``wd``.

    Returns (markdown_lines, ok, salted_diverged)."""
    from multimodalpromptretrieval_tpu.data.datasets import load_dataset
    from multimodalpromptretrieval_tpu.data.synthetic import (
        generate_synthetic_slake,
        synthetic_config,
    )
    from multimodalpromptretrieval_tpu.text import T5SentencePieceTokenizer
    from multimodalpromptretrieval_tpu.train.experiment import (
        Experiment,
        tokenizer_corpus,
    )

    # -- 1. data + config ---------------------------------------------------
    log(f"[{variant}] generating synthetic SLAKE corpus")
    generate_synthetic_slake(os.path.join(wd, "SLAKE"), n_train=32,
                             n_validate=8, n_test=16, image_size=32, seed=0)
    if variant == "transfer":
        from multimodalpromptretrieval_tpu.data.synthetic import (
            generate_synthetic_vqarad,
        )

        log(f"[{variant}] generating synthetic VQA_RAD transfer corpus")
        generate_synthetic_vqarad(os.path.join(wd, "VQA_RAD"), n_train=24,
                                  n_test=16, image_size=32, seed=1)
    cfg = synthetic_config(wd, batch_size=8, epochs=args.epochs,
                           retrieval=args.retrieval, k=args.k, image_size=32)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    cfg.update(_OVERLAY[variant])
    if variant in ("head", "ban"):
        # the reference hardcodes head/BAN dims to 512
        cfg["t5_overrides"]["d_model"] = 512
        cfg["clip_overrides"]["embed_dim"] = 512
    if variant == "ban":
        # BAN predictions depend on the TEST BATCH COMPOSITION: the
        # reference pads each batch to its longest row and its BiAttention
        # softmax / BiResNet sum run over every padded column, while its
        # test DataLoader shuffles with torch's RNG (whose draw sequence
        # this framework does not replicate). One batch ≥ the test set
        # makes the composition permutation-invariant on both sides, so
        # the remaining comparison is pure model math.
        cfg["hyperparameters"]["batch_size"] = 64

    # the decode space must be identical on both sides: size the T5 vocab
    # to the hermetic tokenizer (+1 for the reference's "[itk]" token), so
    # HF's resize_token_embeddings(len(tokenizer)) is a no-op
    ds = [load_dataset(wd, "SLAKE", s)
          for s in ("train", "validate", "test")]
    corpus = tokenizer_corpus(*ds)
    n_vocab = len(T5SentencePieceTokenizer.from_corpus(corpus)) + 1
    cfg["t5_overrides"]["vocab_size"] = n_vocab
    log(f"[{variant}] tokenizer vocab: {n_vocab - 1} pieces (+ [itk])")
    with open(os.path.join(wd, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    with open(os.path.join(wd, "corpus.json"), "w") as f:
        json.dump(corpus, f)

    # -- 2. train + test in THIS framework ----------------------------------
    log(f"[{variant}] training the JAX framework ({args.epochs} epochs)")
    jax_logs = os.path.join(wd, "jax_logs")
    exp = Experiment(cfg, train_mode=True, quiet=True, log_root=jax_logs,
                     model_root=os.path.join(wd, "models"))
    exp.train()
    exp_t = Experiment(cfg, train_mode=False, quiet=True, log_root=jax_logs,
                       model_root=os.path.join(wd, "models"))
    metrics = exp_t.test()
    jax_report = metrics.report()
    log(f"[{variant}] JAX framework test done:\n" + jax_report)

    # -- 3. export weights into the reference checkpoint format -------------
    import numpy as np

    from multimodalpromptretrieval_tpu.models.export import (
        clip_to_openai,
        mprgen_to_reference_state_dict,
    )

    spec = {
        "clip_weights": os.path.join(wd, "clip_weights.pt"),
        "clip": {
            "context_length": exp_t.model_cfg.clip.context_length,
            "vision_heads": exp_t.model_cfg.clip.vision_heads,
            "text_heads": exp_t.model_cfg.clip.text_heads,
        },
        "corpus": os.path.join(wd, "corpus.json"),
        "t5": {
            "vocab_size": n_vocab,
            "d_model": exp_t.model_cfg.t5.d_model,
            "d_kv": exp_t.model_cfg.t5.d_kv,
            "d_ff": exp_t.model_cfg.t5.d_ff,
            "num_layers": exp_t.model_cfg.t5.num_layers,
            "num_decoder_layers": exp_t.model_cfg.t5.num_decoder_layers,
            "num_heads": exp_t.model_cfg.t5.num_heads,
            "feed_forward_proj": "relu",
            "tie_word_embeddings": True,
            "dropout_rate": 0.1,
            "pad_token_id": 0, "eos_token_id": 1,
            "decoder_start_token_id": 0,
        },
    }
    spec_path = os.path.join(wd, "spec.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f, indent=1)

    import torch

    torch.save({k: torch.tensor(np.ascontiguousarray(v)) for k, v in
                clip_to_openai(exp_t.params["clip"],
                               exp_t.model_cfg.clip).items()},
               spec["clip_weights"])
    sd = mprgen_to_reference_state_dict(exp_t.params, exp_t.model_cfg)
    sd_path = os.path.join(wd, "exported_sd.npz")
    np.savez(sd_path, **sd)

    env = dict(os.environ, PARITY_SPEC=spec_path, JAX_PLATFORMS="cpu",
               MPLBACKEND="Agg", TOKENIZERS_PARALLELISM="false")
    log(f"[{variant}] building the reference checkpoint (strict load)")
    r = subprocess.run(
        [sys.executable, os.path.join(_HERE, "ref_driver.py"), "export",
         sd_path, os.path.join(wd, "config.json"),
         str(cfg["hyperparameters"]["learning_rate"])],
        cwd=wd, env=env, capture_output=True, text=True, timeout=1200)
    if r.returncode:
        sys.exit(f"export failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}")
    log(r.stdout.strip().splitlines()[-1])

    # -- 4. run the ACTUAL reference driver in --test mode -------------------
    log(f"[{variant}] running the reference driver (--test, torch CPU)")
    r = subprocess.run(
        [sys.executable, os.path.join(_HERE, "ref_driver.py"), "--test",
         "--config", os.path.join(wd, "config.json")],
        cwd=wd, env=env, capture_output=True, text=True, timeout=3600)
    if r.returncode:
        sys.exit(f"reference --test failed:\n{r.stdout[-4000:]}\n"
                 f"{r.stderr[-4000:]}")
    ref_out = r.stdout
    log(f"[{variant}] reference test done")

    # -- 5. diff ------------------------------------------------------------
    jax_p = parse_report(jax_report)
    ref_p = parse_report(ref_out)

    def idset(path):
        with open(path) as f:
            return {l.strip() for l in f if l.strip()}

    jax_correct = idset(os.path.join(jax_logs, "correct_ids.txt"))
    ref_correct = idset(os.path.join(wd, "logs", "correct_ids.txt"))
    jax_wrong = idset(os.path.join(jax_logs, "incorrect_ids.txt"))
    ref_wrong = idset(os.path.join(wd, "logs", "incorrect_ids.txt"))
    n_total = len(jax_correct | jax_wrong)
    disagree = (jax_correct ^ ref_correct) | (jax_wrong ^ ref_wrong)

    tables_match = (jax_p["tasks"] == ref_p["tasks"]
                    and jax_p["open"] == ref_p["open"]
                    and jax_p["closed"] == ref_p["closed"]
                    and jax_p["overall"] == ref_p["overall"])
    ok = tables_match and not disagree

    t5c = exp_t.model_cfg.t5
    lines = [
        f"## Variant: {variant}",
        "",
        f"- reference class: `{_REF_CLASS[variant]}`",
        f"- config: tiny t5 ({t5c.num_layers}L/{t5c.d_model}d, vocab "
        f"{n_vocab}) + tiny ViT, {args.epochs} epochs, retrieval="
        f"{'on, k=' + str(args.k) if args.retrieval else 'off'}",
        f"- test set: {n_total} QA pairs",
        "",
        "| metric | this framework | reference |",
        "|---|---|---|",
    ]
    for k in sorted(set(jax_p["tasks"]) | set(ref_p["tasks"])):
        lines.append(f"| {k} | {jax_p['tasks'].get(k)} | "
                     f"{ref_p['tasks'].get(k)} |")
    for k in ("open", "closed", "overall"):
        lines.append(f"| {k} | {jax_p[k]} | {ref_p[k]} |")
    salted_diverged = False
    if jax_p["retrieval"] or ref_p["retrieval"]:
        lines += ["", "Retrieval-reliance diagnostics:", "",
                  "| diagnostic | this framework | reference |",
                  "|---|---|---|"]
        rj = dict(jax_p["retrieval"])
        rr = dict(ref_p["retrieval"])
        for k in rj:
            mark = ""
            if rj.get(k) != rr.get(k) and "most common" in k:
                mark = " \\*"
                salted_diverged = True
            lines.append(f"| {k}{mark} | {rj.get(k)} | {rr.get(k)} |")
    lines += [
        "",
        f"- identical correct/incorrect outcome: "
        f"**{n_total - len(disagree)}/{n_total}**"
        + (f" (disagreements: {sorted(disagree)})" if disagree else ""),
        f"- metric tables match: **{tables_match}**",
        "",
    ]
    return lines, ok, salted_diverged


_REF_CLASS = {
    "generative": "T5VisionModel",
    "frozen": "T5VisionModelFrozen",
    "head": "T5VisionModelPredictionHead",
    "ban": "T5VisionModelPredictionHeadBAN",
    "transfer": "T5VisionModel (zero-shot SLAKE→VQA_RAD, "
                "retrieval corpus = SLAKE train)",
}

_SALTED_NOTE = (
    "\\* the two \"most common retrieved answer\" diagnostics use the "
    "reference's `max(set(answers), key=answers.count)` "
    "(main.py:281,291-294) — with tied counts the winner comes from *set "
    "iteration order*, which is salted by PYTHONHASHSEED, so these two "
    "numbers differ between two runs of the reference itself. This "
    "framework breaks such ties deterministically by FIRST RETRIEVAL RANK "
    "(the same rule the retrieval prompt vote uses — "
    "train/metrics.py:95-101), so its numbers are identical across "
    "processes; each reference run realizes one of the possible salted "
    "tie resolutions.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/parity_run")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--retrieval", action="store_true")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--variant", default="all",
                    choices=("all",) + VARIANTS)
    ap.add_argument("--keep", action="store_true",
                    help="reuse an existing workdir (skip regeneration)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    variants = VARIANTS if args.variant == "all" else (args.variant,)
    root = os.path.abspath(args.workdir)
    sections, all_ok, any_salted = [], True, False
    for variant in variants:
        wd = os.path.join(root, variant)
        if os.path.exists(wd) and not args.keep:
            shutil.rmtree(wd)
        os.makedirs(wd, exist_ok=True)
        lines, ok, salted = run_variant(args, wd, variant)
        sections += lines
        all_ok = all_ok and ok
        any_salted = any_salted or salted

    lines = [
        "# PARITY_RUN — cross-framework accuracy parity",
        "",
        "For each model variant, trained in this framework on the hermetic "
        "synthetic SLAKE corpus, weights exported to the reference "
        "checkpoint format (models/export.py), then the **actual reference "
        "driver** (`/root/reference/main.py`, torch CPU, shimmed deps — "
        "scripts/ref_driver.py) ran `--test` on the same data + weights "
        "with its own class for that variant (main.py:132-146).",
        "",
        "## Verdict",
        "",
        ("**PARITY CONFIRMED** across all variants run — same weights, "
         "same data, same answers in both frameworks."
         if all_ok else
         "**DIVERGENCE** — see disagreements below; investigate before "
         "claiming parity."),
        f"\nVariants run: {', '.join(variants)}.",
        "",
    ] + sections
    if any_salted:
        lines += [_SALTED_NOTE, ""]
    report_path = os.path.join(_REPO, "PARITY_RUN.md")
    with open(report_path, "w") as f:
        f.write("\n".join(lines))
    log(f"wrote {report_path}")
    print("\n".join(lines))
    if not all_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
