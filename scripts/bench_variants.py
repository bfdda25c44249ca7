"""Bisect the round-2 kernel changes on-chip: which ones actually win?

Round-2 changed three things in the encoder towers (fused LN kernels,
packed-QKV row attention, G-image packing) and rebuilt the decode loop
(row-layout caches + fused QKV + Pallas/XLA single-query attention). The
component bench showed the combination REGRESSING vs the r1 numbers
(vit_row 43 -> 53 ms), so this script measures each variant in isolation,
including the actual r1 modules extracted via ``git show``.

    python scripts/bench_variants.py [--batch 512] [--iters 20]
"""

import argparse
import importlib.util
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def load_rev_module(rev: str, relpath: str, name: str):
    """Import `relpath` as of git revision `rev` under module name `name`."""
    src = subprocess.run(
        ["git", "-C", ROOT, "show", f"{rev}:{relpath}"],
        capture_output=True, text=True, check=True).stdout
    path = f"/tmp/{name}.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def timed(fn, args, iters):
    import numpy as np

    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--r1-rev", default="f71a18f")
    p.add_argument("--only", default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from multimodalpromptretrieval_tpu.models import clip as clip_mod
    from multimodalpromptretrieval_tpu.models import t5 as t5_mod
    from multimodalpromptretrieval_tpu.ops import norm as norm_mod
    from multimodalpromptretrieval_tpu.ops import row_attention as row_mod
    from multimodalpromptretrieval_tpu.ops.layers import layer_norm, rms_norm

    B = args.batch
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    import dataclasses

    cfg_row = dataclasses.replace(clip_mod.CLIPConfig.vit_b32(),
                                  attention_impl="row")
    params = jax.tree.map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x,
        clip_mod.init_clip(jax.random.PRNGKey(0), cfg_row))
    images = jnp.asarray(rng.normal(size=(B, 3, 224, 224)), dt)

    orig_ln = norm_mod.fused_layer_norm
    orig_rms = norm_mod.fused_rms_norm
    orig_g = row_mod._PACK_G_CANDIDATES

    def set_ln(fused: bool):
        norm_mod.fused_layer_norm = (
            orig_ln if fused else
            lambda x, w, b, eps=1e-5, interpret=None: layer_norm(x, w, b, eps))
        norm_mod.fused_rms_norm = (
            orig_rms if fused else
            lambda x, w, eps=1e-6, interpret=None: rms_norm(x, w, eps))

    def set_g(on: bool):
        row_mod._PACK_G_CANDIDATES = orig_g if on else ()

    results = {}

    def bench(name, fn, a):
        if args.only and args.only not in name:
            return
        try:
            ms = timed(fn, a, args.iters)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]}")
            return
        results[name] = ms
        print(f"{name:28s} {ms:8.2f} ms/iter")

    def vit(mod, cfg):
        return jax.jit(lambda p, x: jnp.sum(
            mod.clip_image_tokens(p, cfg, x).astype(jnp.float32)))

    # current module, 4 variants
    for ln_fused in (True, False):
        for g_on in (True, False):
            set_ln(ln_fused)
            set_g(g_on)
            name = (f"vit_row ln={'fused' if ln_fused else 'xla'} "
                    f"G={'auto' if g_on else '1'}")
            bench(name, vit(clip_mod, cfg_row), (params, images))
            # new jit identity per variant: clear to avoid reusing traces
            jax.clear_caches()
    set_ln(True)
    set_g(True)

    # r1 modules on the same weights
    try:
        r1_clip = load_rev_module(
            args.r1_rev, "multimodalpromptretrieval_tpu/models/clip.py",
            "r1_clip")
        cfg_r1 = dataclasses.replace(r1_clip.CLIPConfig.vit_b32(),
                                     attention_impl="row")
        bench("vit_row r1", vit(r1_clip, cfg_r1), (params, images))
    except Exception as e:  # noqa: BLE001
        print(f"vit_row r1 load failed: {e}")

    # ---- decode: current (xla + row caches) vs r1 (head-layout caches) ----
    t5_cfg = t5_mod.T5Config.t5_small()
    tp = jax.tree.map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x,
        t5_mod.init_t5(jax.random.PRNGKey(1), t5_cfg))
    L_src = 82
    embeds = jnp.asarray(rng.normal(size=(B, L_src, 512)), dt)
    mask = jnp.ones((B, L_src), jnp.int32)
    enc = jax.jit(lambda p, e, m: t5_mod.t5_encode(p, t5_cfg, e, m))(
        tp, embeds, mask)

    def dec(mod, cfg):
        return jax.jit(lambda p, e, m: mod.t5_greedy_decode(
            p, cfg, e, m, max_new_tokens=20, early_stop=False))

    bench("decode_20 current(xla)", dec(t5_mod, t5_cfg), (tp, enc, mask))
    try:
        r1_t5 = load_rev_module(
            args.r1_rev, "multimodalpromptretrieval_tpu/models/t5.py",
            "r1_t5")
        bench("decode_20 r1", dec(r1_t5, r1_t5.T5Config.t5_small()),
              (tp, enc, mask))
    except Exception as e:  # noqa: BLE001
        print(f"decode r1 load failed: {e}")

    # ---- T5 encoder row vs xla, both LN modes ----
    t5_row = dataclasses.replace(t5_cfg, attention_impl="row")
    for ln_fused in (True, False):
        set_ln(ln_fused)
        bench(f"t5_enc_row ln={'fused' if ln_fused else 'xla'}",
              jax.jit(lambda p, e, m: jnp.sum(t5_mod.t5_encode(
                  p, t5_row, e, m).astype(jnp.float32))),
              (tp, embeds, mask))
        jax.clear_caches()
    set_ln(True)


if __name__ == "__main__":
    main()
