"""Microbenchmark the VGG loss trunk's components on TPU.

Times conv-only vs pool variants fwd and fwd+bwd at the largest pyramid
level's shape, to locate the non-MXU time in the loss step (suspects:
SelectAndScatter in maxpool backward, conv1_1's 3-channel input).
Usage: python tools/vgg_anatomy.py [V]
"""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.models.vgg import (VGG_CONVS, _conv3x3, _maxpool2,
                                      init_vgg_params, vgg_features)

V = int(sys.argv[1]) if len(sys.argv) > 1 else 4
H, W = 784, 1045
REPS = 10
PREC = jax.lax.Precision.DEFAULT


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


def reshape_maxpool2(x):
    b, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2, :]
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(jnp.max(x, axis=4), axis=2)


def main():
    params = init_vgg_params(rng=0, scale=0.05, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((V, H, W, 3), dtype=np.float32) * 255 - 120,
                    dtype=jnp.bfloat16)
    print(f"# V={V} {H}x{W} bf16, precision=DEFAULT", flush=True)

    keys = ("r11", "r21", "r31", "r41", "r51", "r42")

    def trunk(x, pool):
        outs = vgg_features(params, x, keys, pool=pool,
                            compute_dtype=jnp.bfloat16, precision=PREC)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs.values())

    f_max = jax.jit(lambda x: trunk(x, "max"))
    g_max = jax.jit(jax.grad(lambda x: trunk(x, "max")))
    f_avg = jax.jit(lambda x: trunk(x, "avg"))
    g_avg = jax.jit(jax.grad(lambda x: trunk(x, "avg")))

    t_fm = timed("trunk fwd (maxpool)", f_max, x)
    t_gm = timed("trunk fwd+bwd (maxpool)", g_max, x)
    t_fa = timed("trunk fwd (avgpool)", f_avg, x)
    t_ga = timed("trunk fwd+bwd (avgpool)", g_avg, x)

    # reshape-based maxpool trunk
    def trunk_rmax(x):
        h = x
        acc = jnp.zeros((), jnp.float32)
        wanted = {"r11", "r21", "r31", "r41", "r51", "r42"}
        from stylemesh_tpu.models.vgg import _TRUNK
        for name, conv in _TRUNK:
            if conv is not None:
                k = params[conv]["kernel"].astype(jnp.bfloat16)
                b = params[conv]["bias"]
                h = jax.nn.relu(_conv3x3(h, k, b, PREC))
            else:
                h = reshape_maxpool2(h)
            if name in wanted:
                acc = acc + jnp.sum(h.astype(jnp.float32) ** 2)
            if name == "r51":
                break
        return acc

    f_rm = jax.jit(trunk_rmax)
    g_rm = jax.jit(jax.grad(trunk_rmax))
    t_fr = timed("trunk fwd (reshape maxpool)", f_rm, x)
    t_gr = timed("trunk fwd+bwd (reshape maxpool)", g_rm, x)

    # isolate pools: single maxpool fwd+bwd at r12 shape (V,784,1045,64)
    y = jnp.asarray(rng.random((V, H, W, 64), dtype=np.float32),
                    dtype=jnp.bfloat16)
    p_f = jax.jit(lambda y: jnp.sum(_maxpool2(y).astype(jnp.float32)))
    p_g = jax.jit(jax.grad(lambda y: jnp.sum(_maxpool2(y).astype(jnp.float32))))
    r_f = jax.jit(lambda y: jnp.sum(reshape_maxpool2(y).astype(jnp.float32)))
    r_g = jax.jit(jax.grad(
        lambda y: jnp.sum(reshape_maxpool2(y).astype(jnp.float32))))
    timed("one maxpool fwd 64ch", p_f, y)
    timed("one maxpool fwd+bwd 64ch (SelectAndScatter?)", p_g, y)
    timed("one reshape-maxpool fwd 64ch", r_f, y)
    timed("one reshape-maxpool fwd+bwd 64ch", r_g, y)

    # isolate conv1_1 (3ch input) and conv1_2 (64ch)
    k11 = params["conv1_1"]["kernel"].astype(jnp.bfloat16)
    b11 = params["conv1_1"]["bias"]
    k12 = params["conv1_2"]["kernel"].astype(jnp.bfloat16)
    b12 = params["conv1_2"]["bias"]
    c11_g = jax.jit(jax.grad(
        lambda x: jnp.sum(_conv3x3(x, k11, b11, PREC).astype(jnp.float32) ** 2)))
    c12_g = jax.jit(jax.grad(
        lambda y: jnp.sum(_conv3x3(y, k12, b12, PREC).astype(jnp.float32) ** 2)))
    timed("conv1_1 fwd+bwd (3->64)", c11_g, x)
    timed("conv1_2 fwd+bwd (64->64)", c12_g, y)

    print(f"# maxpool trunk bwd-only ~{t_gm - t_fm:.1f} ms | "
          f"avg {t_ga - t_fa:.1f} | reshape {t_gr - t_fr:.1f}")


if __name__ == "__main__":
    main()
