"""Bisect the Mosaic lowering failure seen in tools/mfu_probe.py (round 5).

Compiles the VGG trunk's loss-grad in isolation at each pyramid-level shape
the probe uses, fused paths on, and reports which (level, path) fails to
lower. Compile-only (jit .lower().compile()) — no step execution.

Usage: python tools/repro_mosaic.py [level_index ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.models.vgg import init_vgg_params, vgg_features

V = 4
LEVELS = [(256, 341), (432, 576), (608, 810), (784, 1045)]
WANT = ("r11", "r21", "r31", "r41", "r51", "p2")


def main():
    picks = [int(a) for a in sys.argv[1:]] or list(range(len(LEVELS)))
    params = init_vgg_params(rng=0, scale=0.05)
    for li in picks:
        h, w = LEVELS[li]
        x = jnp.asarray(np.random.default_rng(0).random((V, h, w, 3),
                                                        dtype=np.float32))

        def loss(t):
            outs = vgg_features(params, t, WANT, compute_dtype=jnp.bfloat16,
                                precision=jax.lax.Precision.DEFAULT)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                       for o in outs.values())

        for tag, fn in (("fwd", loss), ("grad", jax.grad(loss))):
            try:
                jax.jit(fn).lower(x).compile()
                print(f"level {li} ({h}x{w}) {tag}: OK", flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:200]
                print(f"level {li} ({h}x{w}) {tag}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
