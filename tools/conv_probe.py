"""Probe alternative formulations of the full-res 64-channel VGG convs.

conv1_2 fwd+bwd measures ~20 TFLOP/s (10% of v5e bf16 peak) via
lax.conv_general_dilated. Compare: plain conv, im2col+matmul, 9-shift
matmul accumulation, wider channel counts, and a fused block-1.
Usage: python tools/conv_probe.py
"""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

V, H, W = 4, 784, 1045
REPS = 10
PREC = jax.lax.Precision.DEFAULT


def timed(name, fn, *args, flops=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    eff = f"  {flops / dt / 1e9:7.1f} TF/s" if flops else ""
    print(f"{dt:9.2f} ms{eff}  {name}", flush=True)
    return dt


def conv(x, k, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1),
        padding=((1, 1), (1, 1)) if pad == "SAME" else pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=PREC)


def main():
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.normal(size=(V, H, W, 64)), dtype=jnp.bfloat16)
    k64 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    px = V * H * W
    fl_fwd = 2 * 9 * 64 * 64 * px

    f = jax.jit(lambda x: conv(x, k64))
    timed("conv64 fwd (lax.conv NHWC)", f, x64, flops=fl_fwd)
    g = jax.jit(jax.grad(lambda x: jnp.sum(conv(x, k64).astype(jnp.float32) ** 2)))
    timed("conv64 fwd+bwd", g, x64, flops=3 * fl_fwd)

    # value-and-grad-of-output style: conv + transposed conv separately
    ct = jnp.asarray(rng.normal(size=(V, H, W, 64)), dtype=jnp.bfloat16)
    kT = jnp.flip(k64, (0, 1)).transpose(0, 1, 3, 2)
    fT = jax.jit(lambda c: conv(c, kT))
    timed("conv64 transpose alone", fT, ct, flops=fl_fwd)

    # im2col + one matmul
    def im2col(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(3) for dx in range(3)]
        return jnp.concatenate(cols, axis=-1)  # [V,H,W,576]

    km = k64.reshape(576, 64)
    f2 = jax.jit(lambda x: im2col(x).reshape(-1, 576) @ km)
    timed("conv64 fwd (im2col+matmul)", f2, x64, flops=fl_fwd)

    # 9-shift matmul accumulation
    def shift9(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((V, H, W, 64), jnp.float32)
        for i, (dy, dx) in enumerate([(a, b) for a in range(3) for b in range(3)]):
            acc = acc + jax.lax.dot_general(
                xp[:, dy:dy + H, dx:dx + W, :], k64[dy, dx],
                (((3,), (0,)), ((), ())), precision=PREC,
                preferred_element_type=jnp.float32)
        return acc

    f3 = jax.jit(shift9)
    timed("conv64 fwd (9-shift matmul)", f3, x64, flops=fl_fwd)

    # channel width scan: is 128 proportionally faster per flop?
    x128 = jnp.asarray(rng.normal(size=(V, H // 2, W // 2, 128)), jnp.bfloat16)
    k128 = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.bfloat16)
    f4 = jax.jit(lambda x: conv(x, k128))
    timed("conv128 fwd at H/2 (same flops)", f4, x128, flops=fl_fwd)

    x256 = jnp.asarray(rng.normal(size=(V, H // 4, W // 4, 256)), jnp.bfloat16)
    k256 = jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.05, jnp.bfloat16)
    f5 = jax.jit(lambda x: conv(x, k256))
    timed("conv256 fwd at H/4 (same flops)", f5, x256, flops=fl_fwd)

    x512 = jnp.asarray(rng.normal(size=(V, H // 8, W // 8, 512)), jnp.bfloat16)
    k512 = jnp.asarray(rng.normal(size=(3, 3, 512, 512)) * 0.05, jnp.bfloat16)
    f6 = jax.jit(lambda x: conv(x, k512))
    timed("conv512 fwd at H/8 (same flops)", f6, x512, flops=fl_fwd)

    # batched-views as one image vs separate: does V=4 batch hurt?
    x1 = x64.reshape(1, V * H, W, 64)
    f7 = jax.jit(lambda x: conv(x, k64))
    timed("conv64 fwd V folded into H", f7, x1, flops=fl_fwd)

    # space-to-depth-ish: W pairs into channels (exact only for stride-2;
    # just measuring layout effect of 128-minor)
    xs = x64.reshape(V, H, W // 5 * 5, 64)[:, :, :, :].reshape(V, H, -1, 128)
    f8 = jax.jit(lambda x: conv(x, k128))
    timed("conv128 fwd (W halved layout probe)", f8, xs, flops=2 * fl_fwd)


if __name__ == "__main__":
    main()
