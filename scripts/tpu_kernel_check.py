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

    # fused norm kernels: values AND grads vs the jnp implementations
    from multimodalpromptretrieval_tpu.ops.layers import (
        layer_norm as ln_ref,
        rms_norm as rms_ref,
    )
    from multimodalpromptretrieval_tpu.ops.norm import (
        fused_layer_norm,
        fused_rms_norm,
    )

    xn = jnp.asarray(rng.normal(size=(384, 512)).astype(np.float32))
    wn = jnp.asarray(rng.normal(size=(512,)).astype(np.float32))
    bn = jnp.asarray(rng.normal(size=(512,)).astype(np.float32))
    f_ln = jax.jit(lambda x, w, b: jnp.sum(fused_layer_norm(x, w, b) ** 2))
    f_lr = jax.jit(lambda x, w, b: jnp.sum(ln_ref(x, w, b) ** 2))
    gv = jax.value_and_grad(f_ln, argnums=(0, 1, 2))(xn, wn, bn)
    rv = jax.value_and_grad(f_lr, argnums=(0, 1, 2))(xn, wn, bn)
    d = max(abs(float(gv[0]) - float(rv[0])) / abs(float(rv[0])),
            *(np.abs(np.asarray(a) - np.asarray(b)).max()
              for a, b in zip(gv[1], rv[1])))
    check("fused_layer_norm[val+grad]", d < 1e-3, f"maxdiff={d:.5f}")

    f_rn = jax.jit(lambda x, w: jnp.sum(fused_rms_norm(x, w) ** 2))
    f_rr = jax.jit(lambda x, w: jnp.sum(rms_ref(x, w) ** 2))
    gv = jax.value_and_grad(f_rn, argnums=(0, 1))(xn, wn)
    rv = jax.value_and_grad(f_rr, argnums=(0, 1))(xn, wn)
    d = max(abs(float(gv[0]) - float(rv[0])) / abs(float(rv[0])),
            *(np.abs(np.asarray(a) - np.asarray(b)).max()
              for a, b in zip(gv[1], rv[1])))
    check("fused_rms_norm[val+grad]", d < 1e-3, f"maxdiff={d:.5f}")

    # row attention (ViT/CLIP-text/T5-enc serving path) vs the XLA oracle
    from multimodalpromptretrieval_tpu.ops.row_attention import (
        row_attention,
        row_attention_packed,
    )

    B, L, H, Dh = 4, 64, 8, 64
    W = H * Dh
    xr = rng.normal(size=(B, L, 3 * W)).astype(np.float32)
    qr, kr, vr = (jnp.asarray(xr[..., i * W:(i + 1) * W], jnp.bfloat16)
                  for i in range(3))
    to_h = lambda t: jnp.transpose(  # noqa: E731
        t.reshape(B, L, H, Dh), (0, 2, 1, 3))
    ref_r = np.asarray(multi_head_attention(
        to_h(qr), to_h(kr), to_h(vr), scale=Dh ** -0.5,
        impl="xla")).astype(np.float32)
    got_r = np.asarray(to_h(row_attention(
        qr, kr, vr, heads=H, scale=Dh ** -0.5))).astype(np.float32)
    d = np.abs(ref_r - got_r).max()
    check("row_attention", d < 5e-2, f"maxdiff={d:.4f}")
    got_p = np.asarray(to_h(row_attention_packed(
        jnp.asarray(xr, jnp.bfloat16), heads=H, scale=Dh ** -0.5,
        causal=True))).astype(np.float32)
    ref_p = np.asarray(multi_head_attention(
        to_h(qr), to_h(kr), to_h(vr), scale=Dh ** -0.5, causal=True,
        impl="xla")).astype(np.float32)
    d = np.abs(ref_p - got_p).max()
    check("row_attention_packed[causal]", d < 5e-2, f"maxdiff={d:.4f}")

    # decode attention: Pallas per-head + one-pass fused vs the reference
    from multimodalpromptretrieval_tpu.ops.decode_attention import (
        decode_attention,
        decode_attention_fused,
        decode_attention_indicator,
        decode_attention_reference,
    )

    B, T, H, Dh = 64, 32, 8, 64
    W = H * Dh
    q32 = rng.normal(size=(B, W)).astype(np.float32)
    k32 = rng.normal(size=(B, T, W)).astype(np.float32)
    v32 = rng.normal(size=(B, T, W)).astype(np.float32)
    biasd = jnp.asarray(rng.normal(size=(H, T)).astype(np.float32))
    maskd = jnp.asarray((rng.random((B, T)) > 0.2).astype(np.int32))
    # fp32 pass, tight: after the Precision.HIGHEST fix all three paths
    # sit at float summation-order distance from the (HIGHEST) reference;
    # the default-precision MXU would bf16-truncate fp32 operands and
    # show up here as ~1e-1
    qf, kf, vf = jnp.asarray(q32), jnp.asarray(k32), jnp.asarray(v32)
    with jax.default_matmul_precision("highest"):
        ref_f = np.asarray(decode_attention_reference(
            qf, kf, vf, biasd, maskd, heads=H))
    for name, fn in (("decode_attention[pallas,f32]", decode_attention),
                     ("decode_attention[fused,f32]",
                      decode_attention_fused),
                     ("decode_attention[indicator,f32]",
                      decode_attention_indicator)):
        got_f = np.asarray(fn(qf, kf, vf, biasd, maskd, heads=H))
        d = np.abs(ref_f - got_f).max()
        check(name, d < 1e-4, f"maxdiff={d:.2e}")
    # bf16 pass: the per-head pallas kernel computes scores from fp32
    # elementwise products (tight); indicator/fused round the q*k
    # products to bf16 BEFORE the score reduction (the documented
    # deviation from the MXU-exact reference einsum — see
    # decode_attention_indicator's docstring), so compare them loosely
    # vs the reference but EXACTLY against each other (same designed
    # rounding points → bit-identical)
    qd, kd, vd = (jnp.asarray(x, jnp.bfloat16) for x in (q32, k32, v32))
    ref_d = np.asarray(decode_attention_reference(
        qd, kd, vd, biasd, maskd, heads=H)).astype(np.float32)
    got_p = np.asarray(decode_attention(
        qd, kd, vd, biasd, maskd, heads=H)).astype(np.float32)
    d = np.abs(ref_d - got_p).max()
    check("decode_attention[pallas,bf16]", d < 5e-2, f"maxdiff={d:.4f}")
    got_i = np.asarray(decode_attention_indicator(
        qd, kd, vd, biasd, maskd, heads=H)).astype(np.float32)
    d = np.abs(ref_d - got_i).max()
    check("decode_attention[indicator,bf16]", d < 0.25, f"maxdiff={d:.4f}")
    got_u = np.asarray(decode_attention_fused(
        qd, kd, vd, biasd, maskd, heads=H)).astype(np.float32)
    d = np.abs(got_i - got_u).max()
    check("decode_attention[fused==indicator,bf16]", d < 1e-6,
          f"maxdiff={d:.2e}")

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
