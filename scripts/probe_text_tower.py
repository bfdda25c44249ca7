"""CLIP text tower probes (VERDICT r3 item 5): 6.2 ms vs 3.1 ms SOL.

Variants at B=512, L=16 (the serving shape, post-EOT-truncation):

  tower        — production clip_encode_text (row path, grouped packing)
  trace        — same, under jax.profiler (writes /tmp/text_trace;
                 summarize with scripts/parse_trace.py)
  packed_rows  — TRUE sequence packing upper bound: run the tower at the
                 row count real tokens would occupy if questions were
                 concatenated (sum(len)/L of the padded rows). This is a
                 FLOP-scaling probe, not an exact implementation: it
                 bounds what a host-side packer could save.

Run on the real chip:  python scripts/probe_text_tower.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--len", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--trace", action="store_true")
    p.add_argument("--sweep", action="store_true",
                   help="sweep the block-diagonal packing group size")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import dataclasses

    import jax.numpy as jnp

    from multimodalpromptretrieval_tpu.models import clip as jclip

    cfg = dataclasses.replace(jclip.CLIPConfig.vit_b32(),
                              attention_impl="row")
    params = jclip.init_clip(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    rng = np.random.default_rng(0)
    B, L = args.batch, args.len

    def ids_batch(n):
        ids = np.zeros((n, L), np.int32)
        for b in range(n):
            ln = int(rng.integers(6, L - 1))
            ids[b, 0] = cfg.vocab_size - 2
            ids[b, 1:ln] = rng.integers(1, 1000, size=ln - 1)
            ids[b, ln] = cfg.vocab_size - 1
        return ids

    ids = jnp.asarray(ids_batch(B))

    def timed(fn, *a):
        np.asarray(fn(*a))
        np.asarray(fn(*a))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        np.asarray(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    tower = jax.jit(lambda i: jclip.clip_encode_text(params, cfg, i))
    ms = timed(tower, ids)
    print(f"tower B={B} L={L}: {ms:.2f} ms")

    if args.sweep:
        base = np.asarray(tower(ids))
        orig = jclip._PACK_GROUPS
        try:
            for g in (16, 32, 4):
                jclip._PACK_GROUPS = (g,)
                tg = jax.jit(
                    lambda i: jclip.clip_encode_text(params, cfg, i))
                msg = timed(tg, ids)
                same = np.array_equal(np.asarray(tg(ids)), base)
                print(f"pack group G={g}: {msg:.2f} ms  bitexact={same}")
        finally:
            jclip._PACK_GROUPS = orig

    # packed-rows upper bound: average real length ~10/16 of the padding
    lens = np.asarray(jnp.sum(ids != 0, axis=1))
    frac = lens.sum() / (B * L)
    Bp = max(8, int(np.ceil(B * frac / 8) * 8))
    ids_p = jnp.asarray(ids_batch(Bp))
    ms_p = timed(tower, ids_p)
    print(f"packed_rows bound: real-token fraction {frac:.2f} -> "
          f"B'={Bp}: {ms_p:.2f} ms")

    if args.trace:
        jax.profiler.start_trace("/tmp/text_trace")
        for _ in range(3):
            out = tower(ids)
        np.asarray(out)
        jax.profiler.stop_trace()
        print("trace written to /tmp/text_trace "
              "(scripts/parse_trace.py /tmp/text_trace)")


if __name__ == "__main__":
    main()
