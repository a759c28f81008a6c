"""Parity + timing for ops/conv_pallas vs lax.conv at the VGG trunk widths.

Usage: python tools/conv_kernel_check.py
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

from stylemesh_tpu.ops.conv_pallas import conv3x3_frozen, conv3x3_mxu

REPS = 10
PREC = jax.lax.Precision.DEFAULT


def xla_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=PREC)


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


def main():
    rng = np.random.default_rng(0)
    cases = [  # (V, H, W, Cin, Cout) spanning the trunk at the largest level
        (4, 784, 1045, 64, 64),
        (4, 392, 522, 64, 128),
        (4, 392, 522, 128, 128),
        (4, 196, 261, 256, 256),
        (4, 98, 130, 512, 512),
    ]
    for (v, h, w, cin, cout) in cases:
        x = jnp.asarray(rng.normal(size=(v, h, w, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.bfloat16)
        fl = 2 * 9 * cin * cout * v * h * w

        ref = jax.jit(xla_conv)(x, k)
        got = jax.jit(conv3x3_mxu)(x, k)
        r = np.asarray(ref, np.float32)
        g = np.asarray(got, np.float32)
        scale = np.abs(r).max()
        err = np.abs(r - g).max() / scale
        print(f"== {v}x{h}x{w} {cin}->{cout}: rel err {err:.2e}")
        assert err < 2e-2, err

        timed(f"  xla  fwd {cin}->{cout}", jax.jit(xla_conv), x, k, flops=fl)
        timed(f"  plls fwd {cin}->{cout}", jax.jit(conv3x3_mxu), x, k, flops=fl)

        # grad parity (input grad only)
        def loss_ref(x):
            return jnp.sum(xla_conv(x, k).astype(jnp.float32) ** 2)

        def loss_plls(x):
            return jnp.sum(conv3x3_frozen(x, k).astype(jnp.float32) ** 2)

        gr = jax.jit(jax.grad(loss_ref))(x)
        gp = jax.jit(jax.grad(loss_plls))(x)
        ga = np.asarray(gr, np.float32)
        gb = np.asarray(gp, np.float32)
        gerr = np.abs(ga - gb).max() / max(np.abs(ga).max(), 1e-9)
        print(f"   grad rel err {gerr:.2e}")
        assert gerr < 4e-2, gerr
        timed(f"  xla  f+b {cin}->{cout}", jax.jit(jax.grad(loss_ref)), x,
              flops=3 * fl)
        timed(f"  plls f+b {cin}->{cout}", jax.jit(jax.grad(loss_plls)), x,
              flops=3 * fl)


if __name__ == "__main__":
    main()
