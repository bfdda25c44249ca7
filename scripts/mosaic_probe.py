"""Probe which Mosaic (Pallas-TPU) lowerings compile on this chip.

Each probe is a minimal pallas_call around ONE op shape we might want in a
kernel; the script prints OK / COMPILE-FAIL per probe so kernel design is
driven by facts, not folklore. Extends the lowering-rule list in
docs/TPU_NOTES.md.

    python scripts/mosaic_probe.py [--only substr]
"""

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    def run(name, kernel, inputs, out_shape):
        if args.only and args.only not in name:
            return
        try:
            specs = [pl.BlockSpec(x.shape, lambda: tuple(0 for _ in x.shape),
                                  memory_space=pltpu.VMEM) for x in inputs]
            out = pl.pallas_call(
                kernel,
                in_specs=specs,
                out_specs=pl.BlockSpec(
                    out_shape.shape, lambda: tuple(0 for _ in out_shape.shape),
                    memory_space=pltpu.VMEM),
                out_shape=out_shape,
            )(*inputs)
            np.asarray(out)
            print(f"OK           {name}")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:110]
            print(f"COMPILE-FAIL {name}: {msg}")

    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def arr(*shape, dtype=bf16):
        return jnp.asarray(rng.normal(size=shape), dtype)

    # --- flat reshape (Bb, T, Dh) -> (Bb*T, Dh) at several T ---
    for Bb, T, Dh in [(16, 82, 64), (64, 20, 64), (256, 5, 64),
                      (64, 24, 64), (64, 16, 64)]:
        def k_reshape(x_ref, o_ref, Bb=Bb, T=T, Dh=Dh):
            o_ref[...] = x_ref[...].reshape(Bb * T, Dh)
        run(f"reshape_flat B{Bb} T{T} Dh{Dh}", k_reshape,
            [arr(Bb, T, Dh)], jax.ShapeDtypeStruct((Bb * T, Dh), bf16))

    # --- batched dot_general (Bb, T, Dh) x (Bb, Dh) -> (Bb, T) ---
    def k_bmv(kx, qx, o_ref):
        o_ref[...] = jax.lax.dot_general(
            kx[...], qx[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
    run("batched_matvec (16,82,64)x(16,64)", k_bmv,
        [arr(16, 82, 64), arr(16, 64)],
        jax.ShapeDtypeStruct((16, 82), f32))

    # --- batched matmul (Bb, T, Dh) x (Bb, Dh, 8) -> (Bb, T, 8) ---
    def k_bmm(kx, qx, o_ref):
        o_ref[...] = jax.lax.dot_general(
            kx[...], qx[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
    run("batched_matmul (16,82,64)x(16,64,8)", k_bmm,
        [arr(16, 82, 64), arr(16, 64, 8)],
        jax.ShapeDtypeStruct((16, 82, 8), f32))

    # --- 3-D elementwise * 2-D broadcast over LANES (Bb, T, 1) ---
    def k_lanebc(x_ref, s_ref, o_ref):
        o_ref[...] = x_ref[...] * s_ref[...][:, :, None]
    run("lane_broadcast (16,82,512)*(16,82,1)", k_lanebc,
        [arr(16, 82, 512), arr(16, 82)],
        jax.ShapeDtypeStruct((16, 82, 512), bf16))

    # --- middle-axis reduce (Bb, T, W) -> (Bb, W) ---
    def k_midred(x_ref, o_ref):
        o_ref[...] = jnp.sum(x_ref[...].astype(jnp.float32),
                             axis=1).astype(o_ref.dtype)
    run("middle_reduce (16,82,512)->(16,512)", k_midred,
        [arr(16, 82, 512)], jax.ShapeDtypeStruct((16, 512), bf16))

    # --- indicator matmul (BbT, W) @ (W, H) -> 2-D reshape (Bb, T*H)? ---
    # head-group reduce: scores for all heads in one MXU pass
    ind = np.zeros((512, 8), np.float32)
    for h in range(8):
        ind[h * 64:(h + 1) * 64, h] = 1.0
    def k_indmm(x_ref, i_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], i_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    run("indicator_matmul (1312,512)@(512,8)", k_indmm,
        [arr(1312, 512), jnp.asarray(ind, bf16)],
        jax.ShapeDtypeStruct((1312, 8), f32))

    # --- sublane broadcast via explicit jnp.broadcast_to (Bb,1,Dh)->(Bb,T,Dh)
    def k_subbc(q_ref, o_ref):
        q = q_ref[...][:, None, :]
        o_ref[...] = jnp.broadcast_to(q, (16, 82, 64)).astype(o_ref.dtype)
    run("sublane_broadcast_to (16,1,64)->(16,82,64)", k_subbc,
        [arr(16, 64)], jax.ShapeDtypeStruct((16, 82, 64), bf16))

    # --- 3-D transpose (Bb, T, H) -> (Bb, H, T) ---
    def k_tr(x_ref, o_ref):
        o_ref[...] = jnp.transpose(x_ref[...], (0, 2, 1))
    run("transpose (16,82,8)->(16,8,82)", k_tr,
        [arr(16, 82, 8)], jax.ShapeDtypeStruct((16, 8, 82), bf16))

    # --- softmax over middle axis of (Bb, T, H) ---
    def k_softmid(x_ref, o_ref):
        s = x_ref[...].astype(jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        o_ref[...] = (e / jnp.sum(e, axis=1, keepdims=True)).astype(
            o_ref.dtype)
    run("softmax_middle (16,82,8)", k_softmid,
        [arr(16, 82, 8)], jax.ShapeDtypeStruct((16, 82, 8), bf16))


if __name__ == "__main__":
    main()
