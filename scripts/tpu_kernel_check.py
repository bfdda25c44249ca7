"""On-chip Pallas kernel validation (the CPU test suite runs the kernels in
interpret mode; this exercises the real Mosaic lowering on TPU hardware).

    python scripts/tpu_kernel_check.py          # uses the session TPU

Prints one PASS/FAIL line per kernel; exits non-zero on failure.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    import numpy as np
    import jax.numpy as jnp

    from multimodalpromptretrieval_tpu.ops.attention import (
        multi_head_attention,
    )
    from multimodalpromptretrieval_tpu.ops.short_attention import (
        short_attention,
    )
    from multimodalpromptretrieval_tpu.ops.topk import l2_topk

    rng = np.random.default_rng(0)
    failures = 0

    def check(name, ok, detail=""):
        nonlocal failures
        print(f"{'PASS' if ok else 'FAIL'} {name} {detail}")
        failures += 0 if ok else 1

    # flash attention vs XLA (bias + mask + causal variants)
    q = jnp.asarray(rng.normal(size=(2, 4, 64, 64)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 4, 128, 64)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, 4, 128, 64)).astype(np.float32),
                    jnp.bfloat16)
    mask = jnp.asarray((rng.random((2, 128)) > 0.2).astype(np.int32))
    bias = jnp.asarray(rng.normal(size=(1, 4, 64, 128)).astype(np.float32))
    ref = np.asarray(multi_head_attention(
        q, k, v, bias=bias, kv_mask=mask, impl="xla")).astype(np.float32)
    got = np.asarray(multi_head_attention(
        q, k, v, bias=bias, kv_mask=mask, impl="pallas")).astype(np.float32)
    d = np.abs(ref - got).max()
    check("flash_attention[bias+mask]", d < 2e-2, f"maxdiff={d:.4f}")

    refc = np.asarray(multi_head_attention(
        q, k[:, :, :64], v[:, :, :64], causal=True,
        impl="xla")).astype(np.float32)
    gotc = np.asarray(multi_head_attention(
        q, k[:, :, :64], v[:, :, :64], causal=True,
        impl="pallas")).astype(np.float32)
    d = np.abs(refc - gotc).max()
    check("flash_attention[causal-skip]", d < 2e-2, f"maxdiff={d:.4f}")

    # fused L2 top-k: exact rank parity
    query = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    index = jnp.asarray(rng.normal(size=(1000, 256)).astype(np.float32))
    d1, i1 = l2_topk(query, index, 5, impl="xla")
    d2, i2 = l2_topk(query, index, 5, impl="pallas")
    check("l2_topk[rank-exact]",
          np.array_equal(np.asarray(i1), np.asarray(i2))
          and np.abs(np.asarray(d1) - np.asarray(d2)).max() < 1e-4)

    # packed short-seq attention
    qs = jnp.asarray(rng.normal(size=(4, 12, 50, 64)).astype(np.float32),
                     jnp.bfloat16)
    refs = np.asarray(multi_head_attention(
        qs, qs, qs, scale=64**-0.5, impl="xla")).astype(np.float32)
    gots = np.asarray(short_attention(
        qs, qs, qs, scale=64**-0.5)).astype(np.float32)
    d = np.abs(refs - gots).max()
    check("short_attention[packed]", d < 5e-2, f"maxdiff={d:.4f}")  # bf16 self-attn rounding; fp32 parity is covered on CPU

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
