"""Where do the train step's 49 ms (B=128) go? Chained-iteration timings
of the full step and its ablations on the real chip.

    python scripts/bench_train_ablation.py [--batch 128] [--iters 20]

Variants (full-size t5-small + ViT-B/32, bf16 compute, frozen CLIP):
  full        loss + grad + AdamW (the bench.py --mode train step)
  no_opt      loss + grad only (isolate the AdamW update)
  fwd         loss only (isolate the backward pass)
  no_vit      loss + grad + AdamW from a PRECOMPUTED visual prefix
              (isolate the frozen ViT forward)
  xla_attn    full step with attention_impl="xla" towers (row-path delta)
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

    variants = {
        "full": step_full(cfg_row),
        "no_vit": step_no_vit(cfg_row),
        "xla_attn": step_full(cfg_xla),
    }
    for name, fn in variants.items():
        if args.only and args.only not in name:
            continue
        ms = timed_state(fn, args.iters)
        print(f"{name:10s} {ms:7.1f} ms/step  "
              f"({B / ms * 1e3:,.0f} ex/s)")

    # stateless variants
    for name, fn in [("no_opt", step_no_opt(cfg_row)),
                     ("fwd", step_fwd(cfg_row))]:
        if args.only and args.only not in name:
            continue
        if name == "no_opt":
            call = lambda: fn(params, batch, lr, key)  # noqa: E731
        else:
            call = lambda: fn(params, batch, key)  # noqa: E731
        np.asarray(call())
        np.asarray(call())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = call()
        np.asarray(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:10s} {ms:7.1f} ms/step  ({B / ms * 1e3:,.0f} ex/s)")


if __name__ == "__main__":
    main()
