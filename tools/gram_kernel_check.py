"""TPU timing: fused masked-gram kernel vs the XLA einsum path, at the
style-loss shapes that dominate (r11/r21 at the large pyramid levels).

Usage: python tools/gram_kernel_check.py
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

from stylemesh_tpu.ops.gram import masked_gram
from stylemesh_tpu.ops.gram_pallas import (fused_masked_grams,
                                           stack_masks)

REPS = 10


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{dt:9.2f} ms  {name}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    cases = [
        (4, 784, 1045, 64, 2),   # r11 @ L3
        (4, 392, 522, 128, 2),   # r21 @ L3
        (4, 608, 811, 64, 2),    # r11 @ L2
    ]
    for v, h, w, c, k in cases:
        f = jnp.asarray(rng.normal(size=(v, h, w, c)), jnp.bfloat16)
        masks = jnp.asarray(rng.random((k, v, h, w)) < 0.6, jnp.float32)
        wct = jnp.asarray(rng.normal(size=(v, k, c, c)), jnp.float32)
        print(f"== {v}x{h}x{w} C={c} K={k}", flush=True)

        def xla_sums(f):
            gs = []
            for i in range(k):
                m = masks[i][..., None]
                g = masked_gram(f, m)
                count = jnp.sum(m.reshape(v, -1), axis=1)
                gs.append(g * jnp.where(count > 0, count, 1.0)[:, None, None])
            return jnp.stack(gs, axis=1)

        mt = jax.device_put(stack_masks(masks))

        x_f = jax.jit(xla_sums)
        p_f = jax.jit(lambda ff: fused_masked_grams(ff, mt, False))
        ref = np.asarray(x_f(f), np.float32)
        got = np.asarray(p_f(f), np.float32)
        err = np.abs(ref - got).max() / np.abs(ref).max()
        print(f"   fwd rel err {err:.2e}", flush=True)

        timed("  xla  fwd", x_f, f)
        timed("  plls fwd", p_f, f)

        x_g = jax.jit(jax.grad(lambda ff: jnp.sum(xla_sums(ff) * wct)))
        p_g = jax.jit(jax.grad(
            lambda ff: jnp.sum(fused_masked_grams(ff, mt, False) * wct)))
        gr = np.asarray(x_g(f), np.float32)
        gp = np.asarray(p_g(f), np.float32)
        gerr = np.abs(gr - gp).max() / np.abs(gr).max()
        print(f"   grad rel err {gerr:.2e}", flush=True)
        timed("  xla  f+b", x_g, f)
        timed("  plls f+b", p_g, f)


if __name__ == "__main__":
    main()
