"""Probe: grouped block-diagonal packing for the CLIP text tower.

At serving text lengths (L=16 after EOT truncation) the row-attention
kernel runs B=512 grid steps of tiny per-head (16, 64, 16) dots — the
tower measures ~13.9 ms vs a ~3.1 ms GEMM floor (docs/TPU_NOTES.md SOL
ledger). Hypothesis: packing G images per grid step by RESHAPING
(B, L, 3W) -> (B/G, G*L, 3W) and masking cross-image scores with a
static block-diagonal additive bias (-1e9 off-block) recovers MXU shape
without the serialized G-loop that sank the earlier packing attempt
(the kernel still runs ONE dot per head per step, just 8x bigger).

Exactness: within-block causal order is preserved by the reshape, the
kernel's causal iota over G*L keeps per-image causality, and -1e9
off-block entries underflow to exactly 0 through the fp32 softmax, so
outputs are bit-identical (asserted here against the ungrouped path).

    python scripts/probe_grouped_text.py [--batch 512] [--len 16]
    JAX_PLATFORMS=cpu python scripts/probe_grouped_text.py --check-only
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--len", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from multimodalpromptretrieval_tpu.ops.layers import (
        dense,
        layer_norm,
        quick_gelu,
    )
    from multimodalpromptretrieval_tpu.ops.norm import fused_layer_norm
    from multimodalpromptretrieval_tpu.ops.row_attention import (
        row_attention_packed,
    )
    from multimodalpromptretrieval_tpu.models.clip import (
        CLIPConfig,
        init_clip,
    )

    B, L = args.batch, args.len
    cfg = CLIPConfig.vit_b32()
    heads, W = cfg.text_heads, cfg.text_width
    Dh = W // heads
    interpret = jax.default_backend() == "cpu"
    params = init_clip(jax.random.PRNGKey(0), cfg)
    blocks = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          params["text"]["blocks"])
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, L, W)), jnp.bfloat16)

    def tower(x, group: int):
        Bq, Lq = x.shape[0], x.shape[1]
        n_layers = jax.tree.leaves(blocks)[0].shape[0]
        if group > 1:
            # static block-diagonal additive bias over the packed rows
            pos = jnp.arange(group * Lq) // Lq
            blockdiag = jnp.where(pos[:, None] == pos[None, :], 0.0, -1e9)
            bias = jnp.broadcast_to(blockdiag[None].astype(jnp.float32),
                                    (heads, group * Lq, group * Lq))
        x = x.reshape(Bq * Lq, W)
        for li in range(n_layers):
            p = jax.tree.map(lambda a: a[li], blocks)
            h = fused_layer_norm(x, p["ln_1"]["w"], p["ln_1"]["b"])
            qkv = dense(h, p["attn"]["wqkv"], p["attn"]["bqkv"])
            if group > 1:
                o = row_attention_packed(
                    qkv.reshape(Bq // group, group * Lq, 3 * W),
                    bias, heads=heads, scale=Dh**-0.5, causal=True,
                    interpret=interpret).reshape(Bq * Lq, W)
            else:
                o = row_attention_packed(
                    qkv.reshape(Bq, Lq, 3 * W), heads=heads,
                    scale=Dh**-0.5, causal=True,
                    interpret=interpret).reshape(Bq * Lq, W)
            x = x + dense(o, p["attn"]["out"], p["attn"]["out_b"])
            h = fused_layer_norm(x, p["ln_2"]["w"], p["ln_2"]["b"])
            h = quick_gelu(dense(h, p["mlp"]["fc"], p["mlp"]["fc_b"]))
            x = x + dense(h, p["mlp"]["proj"], p["mlp"]["proj_b"])
        # scalar output: the tunnel eagerly downloads call results
        return jnp.sum(x.astype(jnp.float32))

    def xla_ref(x):
        from multimodalpromptretrieval_tpu.ops.attention import (
            multi_head_attention,
        )

        Bq, Lq = x.shape[0], x.shape[1]
        n_layers = jax.tree.leaves(blocks)[0].shape[0]
        for li in range(n_layers):
            p = jax.tree.map(lambda a: a[li], blocks)
            h = layer_norm(x, p["ln_1"]["w"], p["ln_1"]["b"])
            qkv = dense(h, p["attn"]["wqkv"], p["attn"]["bqkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            split = lambda y: jnp.transpose(  # noqa: E731
                y.reshape(Bq, Lq, heads, Dh), (0, 2, 1, 3))
            o = multi_head_attention(split(q), split(k), split(v),
                                     causal=True, scale=Dh**-0.5,
                                     impl="xla")
            o = jnp.transpose(o, (0, 2, 1, 3)).reshape(Bq, Lq, W)
            x = x + dense(o, p["attn"]["out"], p["attn"]["out_b"])
            h = layer_norm(x, p["ln_2"]["w"], p["ln_2"]["b"])
            h = quick_gelu(dense(h, p["mlp"]["fc"], p["mlp"]["fc_b"]))
            x = x + dense(h, p["mlp"]["proj"], p["mlp"]["proj_b"])
        return jnp.sum(x.astype(jnp.float32))

    groups = [g for g in (1, 2, 4, 8, 16, 32) if B % g == 0]
    fns = {g: jax.jit(lambda x, g=g: tower(x, g)) for g in groups}
    ref = jax.jit(xla_ref)

    base = np.asarray(fns[1](x0))
    refv = np.asarray(ref(x0))
    print(f"G=1 vs xla: {base} vs {refv} "
          f"(rel {abs(base - refv) / max(abs(refv), 1e-9):.2e})")
    for g in groups[1:]:
        got = np.asarray(fns[g](x0))
        tag = "EXACT" if got == base else f"DIFF {got} vs {base}"
        print(f"G={g}: {tag}")
    if args.check_only:
        return

    for g in groups:
        fn = fns[g]
        np.asarray(fn(x0))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(x0)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"tower G={g}: {ms:.2f} ms")
    np.asarray(ref(x0))
    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = ref(x0)
    np.asarray(out)
    print(f"tower xla: {(time.perf_counter() - t0) / args.iters * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
