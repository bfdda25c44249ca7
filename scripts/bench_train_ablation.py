"""Where do the train step's ms go? Chained-iteration timings of the
full step and its ablations on the real chip.

    python scripts/bench_train_ablation.py [--batch 128] [--iters 20]
    python scripts/bench_train_ablation.py --ledger   # floors + levers

Variants (full-size t5-small + ViT-B/32, bf16 compute, frozen CLIP):
  full        loss + grad + AdamW with the in-step ViT forward
  cached      the ACTUAL bench.py --mode train step: loss + grad + AdamW
              from the frozen-trunk vision-token cache (r2 default)
  bf16_mom    cached with bf16 AdamW moment storage (the r5 lever:
              adamw_init moments_dtype — halves optimizer HBM traffic)
  no_opt      loss + grad only (isolate the AdamW update)
  fwd         loss only (isolate the backward pass)
  no_vit      loss + grad + AdamW from a PRECOMPUTED visual prefix
              (isolate the frozen ViT forward)
  xla_attn    full step with attention_impl="xla" towers (row-path delta)

``--ledger`` additionally prints the per-component speed-of-light floors
from the analytic FLOP/byte model (ops/flops + HBM byte counts) next to
the measured ablation deltas — the train-step counterpart of the
docs/TPU_NOTES.md serve-chunk ledger (VERDICT r4 item 4).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--seq-len", type=int, default=32)
    p.add_argument("--tgt-len", type=int, default=8)
    p.add_argument("--only", default=None)
    p.add_argument("--ledger", action="store_true",
                   help="print analytic per-component SOL floors")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from multimodalpromptretrieval_tpu.models import mprgen
    from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
    from multimodalpromptretrieval_tpu.models.t5 import T5Config
    from multimodalpromptretrieval_tpu.train.optim import (
        adamw_init,
        adamw_update,
    )

    B = args.batch
    rng = np.random.default_rng(0)

    def build(attn):
        t5 = dataclasses.replace(T5Config.t5_small(), attention_impl=attn)
        clip = dataclasses.replace(CLIPConfig.vit_b32(),
                                   attention_impl=attn)
        return mprgen.MPRGenConfig(t5=t5, clip=clip, use_image_info=True,
                                   compute_dtype="bfloat16")

    cfg_row = build("row")
    cfg_xla = build("xla")
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg_row)
    trainable = mprgen.trainable_mask(params, cfg_row)
    opt = adamw_init(params)
    from multimodalpromptretrieval_tpu.train.rng import dropout_key

    key = dropout_key(1)  # hardware-RNG dropout, as the train loop uses
    lr = jnp.float32(1e-4)

    batch = {
        "images": jnp.asarray(rng.normal(
            size=(B, 3, 224, 224)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(
            2, cfg_row.t5.vocab_size, size=(B, args.seq_len)), jnp.int32),
        "text_mask": jnp.ones((B, args.seq_len), jnp.int32),
        "labels": jnp.asarray(rng.integers(
            2, cfg_row.t5.vocab_size, size=(B, args.tgt_len)), jnp.int64),
    }

    def step_full(cfg):
        def f(params, opt, batch, lr, key):
            loss, grads = jax.value_and_grad(mprgen.loss_fn)(
                params, cfg, batch, key)
            params, opt = adamw_update(params, grads, opt, lr,
                                       trainable=trainable)
            return params, opt, loss
        return jax.jit(f, donate_argnums=(0, 1))

    def step_no_opt(cfg):
        def f(params, batch, lr, key):
            loss, grads = jax.value_and_grad(mprgen.loss_fn)(
                params, cfg, batch, key)
            # touch the grads so nothing is dead-code eliminated
            s = sum(jnp.sum(g.astype(jnp.float32))
                    for g in jax.tree.leaves(grads))
            return loss + 0.0 * s
        return jax.jit(f)

    def step_fwd(cfg):
        def f(params, batch, key):
            return mprgen.loss_fn(params, cfg, batch, key)
        return jax.jit(f)

    # precomputed-prefix variant: grad of the T5 part only
    prefix = jnp.asarray(rng.normal(
        size=(B, 50, cfg_row.t5.d_model)).astype(np.float32), jnp.bfloat16)

    def step_no_vit(cfg):
        from multimodalpromptretrieval_tpu.models.t5 import t5_loss

        def loss_from_prefix(params, batch, key):
            p = mprgen.cast_compute(params, cfg)
            q_emb = p["t5"]["shared"][batch["input_ids"]]
            embeds = jnp.concatenate(
                [prefix.astype(q_emb.dtype), q_emb], axis=1)
            mask = jnp.concatenate(
                [jnp.ones((B, 50), jnp.int32), batch["text_mask"]], axis=1)
            return t5_loss(p["t5"], cfg.t5, embeds, mask, batch["labels"],
                           dropout_rng=key)

        def f(params, opt, batch, lr, key):
            loss, grads = jax.value_and_grad(loss_from_prefix)(
                params, batch, key)
            params, opt = adamw_update(params, grads, opt, lr,
                                       trainable=trainable)
            return params, opt, loss
        return jax.jit(f, donate_argnums=(0, 1))

    def timed_state(fn, iters):
        """ms/iter with the donated-state chain (two warmups: compile +
        donation relayout — docs/TPU_NOTES.md). Re-materializes fresh
        params/opt per variant (the chain donates them away)."""
        p = jax.tree.map(jnp.array, params)
        o = jax.tree.map(jnp.array, opt)
        for _ in range(2):
            p, o, loss = fn(p, o, batch, lr, key)
            np.asarray(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            p, o, loss = fn(p, o, batch, lr, key)
        np.asarray(loss)
        return (time.perf_counter() - t0) / iters * 1e3

    # the ACTUAL bench step (run_train): frozen-trunk vision tokens
    # cached per unique image, gathered per batch; step = tail + T5
    from multimodalpromptretrieval_tpu.parallel import mesh as pmesh

    vt = pmesh.make_vision_tokens_step(cfg_row)(params, batch["images"])
    cbatch = dict(batch)
    cbatch.pop("images")
    cbatch["vision_tokens"] = vt

    def timed_cached(moments_dtype, iters):
        fn = pmesh.make_train_step(cfg_row, trainable, donate=True)
        p = jax.tree.map(jnp.array, params)
        o = adamw_init(p, moments_dtype=moments_dtype)
        for _ in range(2):
            p, o, loss = fn(p, o, cbatch, lr, key)
            np.asarray(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            p, o, loss = fn(p, o, cbatch, lr, key)
        np.asarray(loss)
        return (time.perf_counter() - t0) / iters * 1e3

    measured = {}
    for name, md in [("cached", None), ("bf16_mom", "bfloat16")]:
        if args.only and args.only not in name:
            continue
        ms = timed_cached(md, args.iters)
        measured[name] = ms
        print(f"{name:10s} {ms:7.1f} ms/step  "
              f"({B / ms * 1e3:,.0f} ex/s)")

    variants = {
        "full": step_full(cfg_row),
        "no_vit": step_no_vit(cfg_row),
        "xla_attn": step_full(cfg_xla),
    }
    for name, fn in variants.items():
        if args.only and args.only not in name:
            continue
        ms = timed_state(fn, args.iters)
        measured[name] = ms
        print(f"{name:10s} {ms:7.1f} ms/step  "
              f"({B / ms * 1e3:,.0f} ex/s)")

    # stateless variants — on the CACHED batch (vision tokens), so the
    # fwd / (no_opt - fwd) / (cached - no_opt) deltas decompose the same
    # program the bench measures
    for name, fn in [("no_opt", step_no_opt(cfg_row)),
                     ("fwd", step_fwd(cfg_row))]:
        if args.only and args.only not in name:
            continue
        if name == "no_opt":
            call = lambda: fn(params, cbatch, lr, key)  # noqa: E731
        else:
            call = lambda: fn(params, cbatch, key)  # noqa: E731
        np.asarray(call())
        np.asarray(call())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = call()
        np.asarray(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        measured[name] = ms
        print(f"{name:10s} {ms:7.1f} ms/step  ({B / ms * 1e3:,.0f} ex/s)")

    if args.ledger:
        # ---- analytic speed-of-light floors (VERDICT r4 item 4) ----
        from multimodalpromptretrieval_tpu.ops import flops as F

        t5 = cfg_row.t5
        L_enc = 50 + args.seq_len          # visual prefix + text
        T = args.tgt_len
        PEAK = 197e12                      # v5e dense bf16 FLOP/s
        HBM = 819e9                       # v5e HBM bytes/s

        fwd = (F.t5_encoder_flops(t5, B, L_enc)
               + F.t5_decoder_train_flops(t5, B, T, L_enc))
        bwd = 2 * fwd                      # dL/dx + dL/dw per matmul
        # AdamW traffic over the TRAINABLE (T5) params: fp32 read
        # p/g/m/v + write p/m/v = 28 B/param; bf16 moments cut the four
        # moment touches to 2 B each -> 20 B/param
        n_train = sum(int(np.prod(x.shape))
                      for x, t in zip(jax.tree.leaves(params),
                                      jax.tree.leaves(trainable)) if t)
        opt32 = 28 * n_train / HBM * 1e3
        opt16 = 20 * n_train / HBM * 1e3
        # vision-token gather: (B, 50, 768) bf16 read+write
        gather = 2 * (B * 50 * 768 * 2) / HBM * 1e3
        rows = [
            ("T5 fwd (enc L=%d + dec T=%d + head)" % (L_enc, T),
             fwd / PEAK * 1e3, measured.get("fwd")),
            ("T5 bwd (2x fwd matmuls)", bwd / PEAK * 1e3,
             None if "no_opt" not in measured or "fwd" not in measured
             else measured["no_opt"] - measured["fwd"]),
            ("AdamW fp32 (28 B x %.1fM params)" % (n_train / 1e6), opt32,
             None if "cached" not in measured or "no_opt" not in measured
             else measured["cached"] - measured["no_opt"]),
            ("AdamW bf16 moments (20 B/param)", opt16,
             None if "bf16_mom" not in measured
             or "no_opt" not in measured
             else measured["bf16_mom"] - measured["no_opt"]),
            ("vision-token gather (9.8 MB r+w)", gather, None),
        ]
        print("\n--- speed-of-light ledger (B=%d) ---" % B)
        print(f"{'component':44s} {'floor':>8s} {'measured':>9s} "
              f"{'% SOL':>6s}")
        for name, floor, meas in rows:
            m = f"{meas:8.1f}" if meas is not None else "       -"
            pct = (f"{100 * floor / meas:5.0f}%"
                   if meas else "     -")
            print(f"{name:44s} {floor:7.2f} {m} {pct}")
        if "cached" in measured:
            tot = (fwd / PEAK * 1e3 + bwd / PEAK * 1e3 + opt32 + gather)
            print(f"{'step total':44s} {tot:7.2f} "
                  f"{measured['cached']:8.1f} "
                  f"{100 * tot / measured['cached']:5.0f}%")


if __name__ == "__main__":
    main()
