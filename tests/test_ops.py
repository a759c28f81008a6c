"""Golden tests of the core ops against torch CPU reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stylemesh_tpu.ops import (
    erode,
    gatys_post,
    gatys_pre,
    gram_matrix,
    grid_sample,
    grid_sample_nearest,
    image_pyramid,
    masked_gram,
    resize_bilinear,
    resize_nearest,
)
from stylemesh_tpu.ops.gram import masked_mse

RNG = np.random.default_rng(0)


def nhwc_to_nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def nchw_to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


# ---------------------------------------------------------------- color


def test_gatys_pre_matches_reference_formula():
    rgb = RNG.random((4, 5, 3)).astype(np.float32)
    out = np.asarray(gatys_pre(jnp.asarray(rgb)))
    # reference: RGB->BGR, subtract mean, *255 (rgb_transform.py:5-11)
    t = torch.from_numpy(np.moveaxis(rgb, -1, 0).copy())
    t = t[torch.LongTensor([2, 1, 0])]
    mean = torch.tensor([0.40760392, 0.45795686, 0.48501961]).view(3, 1, 1)
    t = (t - mean) * 255.0
    np.testing.assert_allclose(out, np.moveaxis(t.numpy(), 0, -1), atol=1e-5)


def test_gatys_roundtrip():
    rgb = RNG.random((6, 7, 3)).astype(np.float32)
    back = np.asarray(gatys_post(gatys_pre(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


# ---------------------------------------------------------------- resize


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (4, 4)), ((240, 320), (256, 341)),
                                          ((17, 23), (5, 9)), ((5, 9), (17, 23))])
def test_resize_bilinear_matches_torch(in_hw, out_hw):
    x = RNG.random((2,) + in_hw + (3,)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    ref = F.interpolate(nhwc_to_nchw(x), out_hw, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(ours, nchw_to_nhwc(ref), atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (4, 4)), ((240, 320), (256, 341)),
                                          ((17, 23), (5, 9)), ((5, 9), (17, 23))])
def test_resize_nearest_matches_torch(in_hw, out_hw):
    x = RNG.random((2,) + in_hw + (1,)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    ref = F.interpolate(nhwc_to_nchw(x), out_hw, mode="nearest")
    np.testing.assert_allclose(ours, nchw_to_nhwc(ref), atol=0)


# ---------------------------------------------------------------- grid_sample


def _torch_grid_sample(tex_hwc, grid, mode):
    t = torch.from_numpy(np.moveaxis(tex_hwc, -1, 0).copy()).unsqueeze(0)
    g = torch.from_numpy(grid.copy()).unsqueeze(0)
    out = F.grid_sample(t, g, mode=mode, padding_mode="border", align_corners=True)
    return np.moveaxis(out.squeeze(0).numpy(), 0, -1)


def test_grid_sample_matches_torch_bilinear():
    tex = RNG.random((13, 17, 3)).astype(np.float32)
    grid = (RNG.random((9, 11, 2)).astype(np.float32) * 2.6 - 1.3)  # incl. out-of-range
    ours = np.asarray(grid_sample(jnp.asarray(tex), jnp.asarray(grid)))
    ref = _torch_grid_sample(tex, grid, "bilinear")
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_nearest_matches_torch():
    tex = RNG.random((13, 17, 1)).astype(np.float32)
    grid = (RNG.random((9, 11, 2)).astype(np.float32) * 2.6 - 1.3)
    ours = np.asarray(grid_sample_nearest(jnp.asarray(tex), jnp.asarray(grid)))
    ref = _torch_grid_sample(tex, grid, "nearest")
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_grid_sample_grad_matches_torch():
    tex = RNG.random((7, 9, 2)).astype(np.float32)
    grid = (RNG.random((5, 6, 2)).astype(np.float32) * 2.2 - 1.1)
    cotangent = RNG.random((5, 6, 2)).astype(np.float32)

    def f(t):
        return jnp.sum(grid_sample(t, jnp.asarray(grid)) * jnp.asarray(cotangent))

    ours = np.asarray(jax.grad(f)(jnp.asarray(tex)))

    t = torch.from_numpy(np.moveaxis(tex, -1, 0).copy()).unsqueeze(0).requires_grad_(True)
    g = torch.from_numpy(grid.copy()).unsqueeze(0)
    out = F.grid_sample(t, g, mode="bilinear", padding_mode="border", align_corners=True)
    out.backward(torch.from_numpy(np.moveaxis(cotangent, -1, 0).copy()).unsqueeze(0))
    ref = np.moveaxis(t.grad.squeeze(0).numpy(), 0, -1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_grad_numerical():
    tex = RNG.random((4, 5, 1)).astype(np.float32)
    grid = (RNG.random((3, 3, 2)).astype(np.float32) * 1.8 - 0.9)

    @jax.jit
    def f(t):
        return jnp.sum(grid_sample(t, jnp.asarray(grid)) ** 2)

    analytic = np.asarray(jax.grad(f)(jnp.asarray(tex)))
    eps = 1e-3
    numeric = np.zeros_like(tex)
    for i in range(tex.shape[0]):
        for j in range(tex.shape[1]):
            tp, tm = tex.copy(), tex.copy()
            tp[i, j, 0] += eps
            tm[i, j, 0] -= eps
            numeric[i, j, 0] = (float(f(jnp.asarray(tp))) - float(f(jnp.asarray(tm)))) / (2 * eps)
    np.testing.assert_allclose(analytic, numeric, atol=5e-2)


# ---------------------------------------------------------------- gram


def test_gram_matches_torch():
    feats = RNG.random((2, 6, 7, 5)).astype(np.float32)
    ours = np.asarray(gram_matrix(jnp.asarray(feats)))
    t = nhwc_to_nchw(feats)
    b, c, h, w = t.shape
    fl = t.view(b, c, h * w)
    ref = torch.bmm(fl, fl.transpose(1, 2)) / (h * w)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-5)


def test_masked_gram_matches_gather_form():
    feats = RNG.random((1, 6, 7, 5)).astype(np.float32)
    mask = (RNG.random((1, 6, 7, 1)) > 0.5).astype(np.float32)
    ours = np.asarray(masked_gram(jnp.asarray(feats), jnp.asarray(mask)))
    # reference gather-then-gram (content_and_style_losses.py:136-143,74-80)
    t = nhwc_to_nchw(feats)
    m = torch.from_numpy(mask[0, :, :, 0])
    sel = t[:, :, m > 0].unsqueeze(3)  # [1, C, N, 1]
    b, c, n, one = sel.shape
    fl = sel.reshape(b, c, n * one)
    ref = torch.bmm(fl, fl.transpose(1, 2)) / (n * one)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_masked_gram_empty_mask_is_zero():
    feats = jnp.asarray(RNG.random((1, 4, 4, 3)).astype(np.float32))
    mask = jnp.zeros((1, 4, 4, 1), dtype=jnp.float32)
    out = np.asarray(masked_gram(feats, mask))
    assert np.all(out == 0)


def test_masked_mse_matches_gather_form():
    a = RNG.random((1, 6, 7, 5)).astype(np.float32)
    b = RNG.random((1, 6, 7, 5)).astype(np.float32)
    mask = (RNG.random((1, 6, 7, 1)) > 0.5).astype(np.float32)
    ours = float(masked_mse(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask))[0])
    ta, tb = nhwc_to_nchw(a), nhwc_to_nchw(b)
    m = torch.from_numpy(mask[0, :, :, 0])
    ref = F.mse_loss(ta[:, :, m > 0], tb[:, :, m > 0]).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


# ---------------------------------------------------------------- erosion


def test_erode_matches_torch_reference():
    x = (RNG.random((1, 12, 14, 1)) > 0.4).astype(np.float32)
    ours = np.asarray(erode(jnp.asarray(x)))
    # reference erode (model/model.py:204-208)
    t = nhwc_to_nchw(x)
    k = torch.ones(1, 1, 3, 3)
    em = F.conv2d(t, k, padding=(1, 1)) / 9.0
    em = torch.clamp(em, 0, 1)
    ref = t * (em == 1)
    np.testing.assert_allclose(ours, nchw_to_nhwc(ref), atol=0)


# ---------------------------------------------------------------- pyramid


def _torch_image_pyramid(img, levels, reverse=False, minimum_size=256):
    """Literal re-execution of the reference pyramid for comparison."""
    h, w = img.shape[2:]
    pyramid, min_entry, min_index = [], None, len(levels)
    for i, level in enumerate(levels):
        if level == 0:
            pyramid.append(img)
        else:
            h_down, w_down = int(h / 2 ** level), int(w / 2 ** level)
            if h_down < minimum_size or w_down < minimum_size:
                if min_entry is None:
                    if w > h:
                        hd = minimum_size
                        wd = int(w * hd / h)
                    else:
                        wd = minimum_size
                        hd = int(h * wd / w)
                    min_entry = F.interpolate(img, (hd, wd), mode="bilinear")
                    min_index = i
                pyramid.append(min_entry)
            else:
                pyramid.append(F.interpolate(img, (h_down, w_down), mode="bilinear"))
    if reverse:
        rev = pyramid[: min_index + 1][::-1]
        while len(rev) < len(pyramid):
            rev.append(img)
        pyramid = rev
    return pyramid


@pytest.mark.parametrize("hw,reverse", [((512, 768), False), ((512, 768), True),
                                        ((300, 200), True)])
def test_image_pyramid_matches_reference(hw, reverse):
    img = RNG.random((1,) + hw + (3,)).astype(np.float32)
    ours = image_pyramid(jnp.asarray(img), list(range(5)), reverse=reverse, minimum_size=64)
    ref = _torch_image_pyramid(nhwc_to_nchw(img), list(range(5)), reverse=reverse, minimum_size=64)
    assert len(ours) == len(ref)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), nchw_to_nhwc(r), atol=1e-5)
