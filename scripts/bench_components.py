"""On-chip component timings for the serve pipeline at B=512.

Times each tower / op family with N chained iterations and ONE host fetch
(the axon tunnel's ~26 ms sync floor amortizes away; see docs/TPU_NOTES.md).
Every component is wrapped to a SCALAR output inside the jit: the tunnel
eagerly downloads call outputs at ~170 MB/s, so fetching a (512, 50, 512)
tensor would add ~130 ms/call of pure transfer to the reading.

    python scripts/bench_components.py [--batch 512] [--iters 20]

Prints one line per component: name, ms/iter.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(fn, args, iters, fetch=None):
    """ms/iter: run fn chained `iters` times, one host fetch at the end."""
    import numpy as np

    out = fn(*args)
    np.asarray(out[0] if isinstance(out, tuple) else out)  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    r = out[0] if isinstance(out, tuple) else out
    np.asarray(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--seq-len", type=int, default=32)
    p.add_argument("--decode-len", type=int, default=20)
    p.add_argument("--only", default=None,
                   help="comma-separated component-name substrings")
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

    from multimodalpromptretrieval_tpu.models.clip import (
        CLIPConfig,
        clip_encode_text,
        clip_image_tokens,
        init_clip,
    )
    from multimodalpromptretrieval_tpu.models.t5 import (
        T5Config,
        init_t5,
        t5_encode,
        t5_greedy_decode,
    )

    B = args.batch
    iters = args.iters
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    t5_cfg = T5Config.t5_small()
    clip_row = dataclasses.replace(CLIPConfig.vit_b32(),
                                   attention_impl="row")
    clip_xla = CLIPConfig.vit_b32()

    cp = jax.tree.map(lambda x: x.astype(dt) if x.dtype == jnp.float32
                      else x, init_clip(jax.random.PRNGKey(0), clip_row))
    tp = jax.tree.map(lambda x: x.astype(dt) if x.dtype == jnp.float32
                      else x, init_t5(jax.random.PRNGKey(1), t5_cfg))

    images = jnp.asarray(rng.normal(size=(B, 3, 224, 224)), dt)
    text_ids = jnp.asarray(
        rng.integers(1, clip_row.vocab_size, size=(B, 32)), jnp.int32)
    L_src = 50 + args.seq_len
    embeds = jnp.asarray(rng.normal(size=(B, L_src, 512)), dt)
    mask = jnp.ones((B, L_src), jnp.int32)

    comps = {}

    def scal(fn):
        return jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))

    comps["vit_row"] = (
        scal(lambda p, x: clip_image_tokens(p, clip_row, x)), (cp, images))
    comps["vit_xla"] = (
        scal(lambda p, x: clip_image_tokens(p, clip_xla, x)), (cp, images))
    comps["clip_text_xla_L32"] = (
        scal(lambda p, x: clip_encode_text(p, clip_xla, x)), (cp, text_ids))
    comps["clip_text_row_L32"] = (
        scal(lambda p, x: clip_encode_text(p, clip_row, x)), (cp, text_ids))

    t5_row = dataclasses.replace(t5_cfg, attention_impl="row")
    comps["t5_enc_xla"] = (
        scal(lambda p, e, m: t5_encode(p, t5_cfg, e, m)),
        (tp, embeds, mask))
    comps["t5_enc_row"] = (
        scal(lambda p, e, m: t5_encode(p, t5_row, e, m)),
        (tp, embeds, mask))

    enc_out = jax.jit(lambda p, e, m: t5_encode(p, t5_cfg, e, m))(
        tp, embeds, mask)
    for n in (1, 5, 20):
        comps[f"decode_{n}"] = (
            jax.jit(lambda p, e, m, n=n: t5_greedy_decode(
                p, t5_cfg, e, m, max_new_tokens=n, early_stop=False)),
            (tp, enc_out, mask))

    # layernorm family cost probe: 24 LNs over ViT-shaped rows
    x2d = jnp.asarray(rng.normal(size=(B * 50, 768)), dt)
    w = jnp.ones((768,), dt)
    b = jnp.zeros((768,), dt)

    def ln24(x, w, b):
        from multimodalpromptretrieval_tpu.ops.layers import layer_norm
        for _ in range(24):
            x = layer_norm(x, w, b) + x
        return x

    comps["ln24_xla"] = (
        jax.jit(lambda x, w, b: jnp.sum(ln24(x, w, b).astype(jnp.float32))),
        (x2d, w, b))
    try:
        from multimodalpromptretrieval_tpu.ops.norm import fused_layer_norm

        def ln24_fused(x, w, b):
            for _ in range(24):
                x = fused_layer_norm(x, w, b) + x
            return x

        comps["ln24_fused"] = (
            jax.jit(lambda x, w, b: jnp.sum(
                ln24_fused(x, w, b).astype(jnp.float32))), (x2d, w, b))
    except ImportError:
        pass

    only = args.only.split(",") if args.only else None
    for name, (fn, a) in comps.items():
        if only and not any(s in name for s in only):
            continue
        try:
            ms = timed(fn, a, iters)
            print(f"{name:24s} {ms:8.2f} ms/iter")
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
