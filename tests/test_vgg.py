"""VGG-16 parity vs the torch oracle."""

import jax.numpy as jnp
import numpy as np
import torch

from stylemesh_tpu.models.vgg import init_vgg_params, vgg_features
from tests.torch_reference import torch_params_from_jax, vgg_forward

RNG = np.random.default_rng(1)


def test_vgg_features_match_torch():
    params = init_vgg_params(rng=3)
    tparams = torch_params_from_jax(params)
    x = (RNG.random((1, 48, 64, 3)).astype(np.float32) - 0.45) * 255.0
    keys = ["r11", "r21", "r31", "r41", "r42", "r51", "p5"]
    ours = vgg_features(params, jnp.asarray(x), keys)
    theirs = vgg_forward(tparams, torch.from_numpy(np.moveaxis(x, -1, 1).copy()), keys)
    for k in keys:
        a = np.asarray(ours[k])
        b = np.moveaxis(theirs[k].numpy(), 1, -1)
        assert a.shape == b.shape, k
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, err_msg=k)


def test_vgg_avg_pool():
    params = init_vgg_params(rng=3)
    x = jnp.asarray(RNG.random((1, 16, 16, 3)).astype(np.float32))
    out_max = vgg_features(params, x, ["p1"], pool="max")["p1"]
    out_avg = vgg_features(params, x, ["p1"], pool="avg")["p1"]
    assert out_max.shape == out_avg.shape
    assert float(jnp.max(out_avg)) <= float(jnp.max(out_max)) + 1e-6


def test_fused_relu_vjp_matches_unfused(monkeypatch):
    """The fused conv+bias+relu VJP (single residual, mask from the output)
    must produce bit-identical input gradients to the separate relu path."""
    import jax

    params = init_vgg_params(rng=3)
    x = jnp.asarray((RNG.random((1, 32, 40, 3), dtype=np.float32) - 0.45) * 255.0)
    keys = ["r11", "r21", "r31", "p3"]

    def loss(x):
        f = vgg_features(params, x, keys)
        return sum(jnp.sum(v ** 2) for v in f.values())

    monkeypatch.setenv("STYLEMESH_FUSED_RELU", "1")
    v1, g1 = jax.value_and_grad(loss)(x)
    monkeypatch.setenv("STYLEMESH_FUSED_RELU", "0")
    v0, g0 = jax.value_and_grad(loss)(x)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))


def test_w2d_packed_conv_matches_plain(monkeypatch):
    """Width-to-depth packed trunk (STYLEMESH_W2D=1, tools/w2d_probe.py)
    must match the plain path: activations to f32 rounding, input grads
    likewise — odd widths included (the pad-one-column path)."""
    import jax

    from stylemesh_tpu.models import vgg as V

    params = init_vgg_params(rng=5)
    x = jnp.asarray(
        (RNG.random((2, 33, 45, 3)).astype(np.float32) - 0.45) * 255.0)
    keys = ["r11", "r12", "r21", "r22", "r31"]
    prec = jax.lax.Precision.HIGHEST

    def run(keys_or_loss):
        return vgg_features(params, x, keys, precision=prec)

    plain = run(keys)
    monkeypatch.setenv("STYLEMESH_W2D", "1")
    packed = run(keys)
    for k in keys:
        a, b = np.asarray(plain[k]), np.asarray(packed[k])
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=1e-5 * scale, err_msg=k)

    def loss(x, params):
        f = vgg_features(params, x, ["r22"], precision=prec)["r22"]
        return jnp.sum(jnp.sin(f * 1e-2))

    monkeypatch.delenv("STYLEMESH_W2D")
    g_plain = jax.grad(loss)(x, params)
    monkeypatch.setenv("STYLEMESH_W2D", "1")
    g_packed = jax.grad(loss)(x, params)
    scale = max(np.abs(np.asarray(g_plain)).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_plain),
                               atol=1e-5 * scale)

    # 'all' mode packs the 128-channel layers too
    monkeypatch.setenv("STYLEMESH_W2D", "all")
    allp = run(keys)
    for k in keys:
        a, b = np.asarray(plain[k]), np.asarray(allp[k])
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=1e-5 * scale, err_msg=k)
