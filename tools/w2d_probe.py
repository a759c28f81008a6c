"""Width-to-depth packed conv probe — the 64-lane early-VGG-layer fix.

tools/mfu_probe.py shows the trunk's MFU is channel-capped at the shallow
end (conv1_2 ~7%, conv2_1 ~13% vs conv4_x ~58% on v5e): with <=64 output
channels the 128-wide MXU runs half (or less) idle, and the big spatial
dims make XLA's conv tiling pay full-tile padding on the lane dim.

The packed form trades 2x FLOPs for full lanes, exactly:

    x  [V,H,W,C]   ->  xp [V,H,W/2,2C]   (adjacent width pixels -> channels)
    K  [3,3,C,D]   ->  Kp [3,3,2C,2D]    (phase-block kernel, half zeros)
    y = conv(x,K)  ==  unpack(conv(xp,Kp))   (bit-exact in f32)

Each output phase p at packed col j sums original cols 2j+p-1..2j+p+1,
which live in packed cols j-1..j+1 -> a 3x3 packed kernel whose
(kw, phase_in, phase_out) blocks are the original width taps:
    p=0: (0,ph1)<-K[:,0], (1,ph0)<-K[:,1], (1,ph1)<-K[:,2]
    p=1: (1,ph0)<-K[:,0], (1,ph1)<-K[:,1], (2,ph0)<-K[:,2]
6 of 12 blocks nonzero -> 2x FLOPs, but lanes 2C wide and one fewer
width-tile per row. Odd W pads one zero column and drops it after.

Usage: python tools/w2d_probe.py   (prints per-layer A/B, writes
results/w2d_probe.json)
"""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.models.vgg import pack_w2d_kernel, w2d_conv3x3, _conv3x3

REPS = 10
INNER = 8


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS


def bench_one(v, h, w, cin, cout, dtype=jnp.bfloat16):
    prec = jax.lax.Precision.DEFAULT
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((v, h, w, cin), np.float32), dtype)
    k = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), dtype)
    b = jnp.zeros((cout,), jnp.float32)

    def scan_of(conv):
        # in-graph INNER reps whose carry mixes an output scalar back into
        # the input so XLA can neither hoist nor DCE the conv
        def reps(x):
            def body(c, _):
                y = jax.nn.relu(conv(c, k, b, prec))
                mix = (1.0 + 1e-12 * jnp.mean(y)).astype(c.dtype)
                return c * mix, ()
            c, _ = jax.lax.scan(body, x, None, length=INNER)
            return jnp.sum(c.astype(jnp.float32))
        return jax.jit(jax.grad(reps))

    t_plain = timed(scan_of(_conv3x3), x) / INNER
    t_packed = timed(scan_of(w2d_conv3x3), x) / INNER
    fl = 2 * 2.0 * 9 * cin * cout * h * w * v  # fwd + dx
    return t_plain, t_packed, fl


def check_exact():
    """f32 bit-parity of the packed conv + its input gradient (CPU-safe)."""
    rng = np.random.default_rng(1)
    for (h, w, cin, cout) in ((17, 23, 3, 8), (8, 10, 6, 4), (6, 9, 4, 4)):
        x = jnp.asarray(rng.random((2, h, w, cin), np.float32))
        k = jnp.asarray(rng.normal(0, 0.5, (3, 3, cin, cout)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32)
        prec = jax.lax.Precision.HIGHEST

        ref = _conv3x3(x, k, b, prec)
        got = w2d_conv3x3(x, k, b, prec)
        err = float(jnp.abs(ref - got).max())

        g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(_conv3x3(x, k, b, prec))))(x)
        g_got = jax.grad(lambda x: jnp.sum(jnp.sin(w2d_conv3x3(x, k, b, prec))))(x)
        gerr = float(jnp.abs(g_ref - g_got).max())
        print(f"# exactness h{h} w{w} {cin}->{cout}: fwd {err:.2e} grad {gerr:.2e}")
        assert err < 1e-4 and gerr < 1e-4, (err, gerr)


def main():
    check_exact()
    V = 4
    cases = [  # the sub-128-lane trunk layers at level-3 (784px) sizes
        ("conv1_1", 784, 1045, 3, 64),
        ("conv1_2", 784, 1045, 64, 64),
        ("conv2_1", 392, 522, 64, 128),
        ("conv2_2", 392, 522, 128, 128),
        ("conv3_1", 196, 261, 128, 256),
    ]
    rows = []
    print(f"{'layer':>8} {'plain ms':>9} {'packed ms':>10} {'speedup':>8} "
          f"{'plain MFU':>10} {'packed MFU':>11}")
    for name, h, w, cin, cout in cases:
        tp, tk, fl = bench_one(V, h, w, cin, cout)
        from stylemesh_tpu.utils.tpu_peaks import device_peaks
        peak, _ = device_peaks()
        rows.append({"layer": name, "h": h, "w": w, "cin": cin, "cout": cout,
                     "plain_ms": tp * 1e3, "packed_ms": tk * 1e3,
                     "speedup": tp / tk, "plain_mfu": fl / tp / peak,
                     "packed_mfu_effective": fl / tk / peak})
        print(f"{name:>8} {tp*1e3:9.2f} {tk*1e3:10.2f} {tp/tk:8.2f} "
              f"{fl/tp/peak:10.1%} {fl/tk/peak:11.1%}", flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "w2d_probe.json")
    with open(out, "w") as f:
        json.dump({"V": V, "rows": rows}, f, indent=1)
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
