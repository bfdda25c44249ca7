"""bf16 AdamW moments at t5-large: measure the lever where it matters.

The r5 train-step ledger measured `adamw_moments_dtype: "bfloat16"` a
+1.8% win at t5-small (optimizer already at its bandwidth floor). At
t5-large the claim is capacity, not speed: fp32 mu/nu for the ~737M
trainable T5 params cost ~5.9 GB HBM next to ~3.7 GB params on a 16 GB
chip (the r4 OOM wall that forced B=32 + remat). bf16 moments halve
that. This probe times the t5-large trainer-shaped step (scan
attention, remat, the shapes `bench.py --mode t5_large` trains with):

  * B=32 fp32 moments  (the r4 recipe)
  * B=32 bf16 moments  (same recipe, half the optimizer HBM)
  * B=64 bf16 moments  (the capacity the savings buys — expected to
    OOM with fp32 moments)

    python scripts/probe_t5large_moments.py [--iters 10]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--seq-len", type=int, default=32)
    ap.add_argument("--tgt-len", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from multimodalpromptretrieval_tpu.models import mprgen
    from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
    from multimodalpromptretrieval_tpu.models.t5 import T5Config
    from multimodalpromptretrieval_tpu.parallel import mesh as pmesh
    from multimodalpromptretrieval_tpu.train.optim import adamw_init
    from multimodalpromptretrieval_tpu.train.rng import dropout_key

    # the bench t5-large TRAINER shape (bench._t5_large_trainer_overrides):
    # scan-over-layers + per-layer remat; row towers are serve-only
    t5 = dataclasses.replace(T5Config.t5_large(), attention_impl="xla",
                             remat=True)
    clip = CLIPConfig.vit_b32()
    cfg = mprgen.MPRGenConfig(t5=t5, clip=clip, use_image_info=True,
                              compute_dtype="bfloat16")
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    trainable = mprgen.trainable_mask(params, cfg)
    key = dropout_key(1)
    lr = jnp.float32(1e-4)
    rng = np.random.default_rng(0)

    vt_step = pmesh.make_vision_tokens_step(cfg)

    def batch_of(B):
        imgs = jnp.asarray(rng.normal(
            size=(B, 3, 224, 224)).astype(np.float32))
        b = {
            "input_ids": jnp.asarray(rng.integers(
                2, t5.vocab_size, size=(B, args.seq_len)), jnp.int32),
            "text_mask": jnp.ones((B, args.seq_len), jnp.int32),
            "labels": jnp.asarray(rng.integers(
                2, t5.vocab_size, size=(B, args.tgt_len)), jnp.int32),
            "vision_tokens": vt_step(params, imgs),
        }
        return b

    def timed(B, moments_dtype):
        import gc

        gc.collect()
        step = pmesh.make_train_step(cfg, trainable, donate=True)
        p = jax.tree.map(jnp.array, params)
        o = adamw_init(p, moments_dtype=moments_dtype)
        b = batch_of(B)
        t0 = time.time()
        for _ in range(2):  # compile + donation relayout
            p, o, loss = step(p, o, b, lr, key)
            np.asarray(loss)
        print(f"  warm in {time.time()-t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            p, o, loss = step(p, o, b, lr, key)
        np.asarray(loss)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        del p, o, step
        gc.collect()
        return ms

    for name, B, md in (("B=32 fp32 moments", 32, None),
                        ("B=32 bf16 moments", 32, "bfloat16"),
                        ("B=64 bf16 moments", 64, "bfloat16")):
        try:
            ms = timed(B, md)
            print(f"{name:20s} {ms:7.1f} ms/step  "
                  f"({B / ms * 1e3:,.0f} ex/s)", flush=True)
        except Exception as e:
            print(f"{name:20s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
