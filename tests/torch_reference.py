"""Torch oracle implementing the *reference semantics* for parity tests.

This mirrors the behavior of /root/reference/model (VGG features, masked
Gram/MSE losses, pyramid factor logic, angle/depth gradient hooks) so the
JAX implementation can be golden-tested end to end on CPU. It is test-only
code, written against the reference's documented math, not imported by the
package.
"""

import numpy as np
import torch
import torch.nn.functional as F

VGG_CONVS = [
    ("conv1_1", 3, 64), ("conv1_2", 64, 64),
    ("conv2_1", 64, 128), ("conv2_2", 128, 128),
    ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256), ("conv3_4", 256, 256),
    ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512), ("conv4_4", 512, 512),
    ("conv5_1", 512, 512), ("conv5_2", 512, 512), ("conv5_3", 512, 512), ("conv5_4", 512, 512),
]

_TRUNK = [
    ("r11", "conv1_1"), ("r12", "conv1_2"), ("p1", None),
    ("r21", "conv2_1"), ("r22", "conv2_2"), ("p2", None),
    ("r31", "conv3_1"), ("r32", "conv3_2"), ("r33", "conv3_3"), ("r34", "conv3_4"), ("p3", None),
    ("r41", "conv4_1"), ("r42", "conv4_2"), ("r43", "conv4_3"), ("r44", "conv4_4"), ("p4", None),
    ("r51", "conv5_1"), ("r52", "conv5_2"), ("r53", "conv5_3"), ("r54", "conv5_4"), ("p5", None),
]


def torch_params_from_jax(jax_params):
    """HWIO jax params -> dict of torch OIHW tensors."""
    out = {}
    for name, _, _ in VGG_CONVS:
        k = np.asarray(jax_params[name]["kernel"], dtype=np.float32)
        b = np.asarray(jax_params[name]["bias"], dtype=np.float32)
        out[name] = (torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy()),
                     torch.from_numpy(b.copy()))
    return out


def vgg_forward(params, x, out_keys):
    """x: [B, 3, H, W]; returns dict of requested activations."""
    outs = {}
    h = x
    for name, conv in _TRUNK:
        if conv is not None:
            w, b = params[conv]
            h = F.relu(F.conv2d(h, w, b, padding=1))
        else:
            h = F.max_pool2d(h, 2, 2)
        outs[name] = h
        if all(k in outs for k in out_keys):
            break
    return {k: outs[k] for k in out_keys}


def gram(x):
    b, c, h, w = x.shape
    fl = x.reshape(b, c, h * w)
    return torch.bmm(fl, fl.transpose(1, 2)) / (h * w)


def masked_features(features, mask):
    cropped = features[:, :, mask.squeeze() > 0].unsqueeze(3)
    if cropped.shape[2] == 0:
        return torch.zeros_like(features).reshape(
            features.shape[0], features.shape[1], -1).unsqueeze(3)
    return cropped


def image_pyramid(img, levels, reverse=False, minimum_size=256):
    h, w = img.shape[2:]
    pyramid, min_entry, min_index = [], None, len(levels)
    for i, level in enumerate(levels):
        if level == 0:
            pyramid.append(img)
            continue
        hd, wd = int(h / 2 ** level), int(w / 2 ** level)
        if hd < minimum_size or wd < minimum_size:
            if min_entry is None:
                if w > h:
                    hh = minimum_size
                    ww = int(w * hh / h)
                else:
                    ww = minimum_size
                    hh = int(h * ww / w)
                min_entry = F.interpolate(img, (hh, ww), mode="bilinear")
                min_index = i
            pyramid.append(min_entry)
        else:
            pyramid.append(F.interpolate(img, (hd, wd), mode="bilinear"))
    if reverse:
        rev = pyramid[: min_index + 1][::-1]
        while len(rev) < len(pyramid):
            rev.append(img)
        pyramid = rev
    return pyramid


def erode(x, kernel_size=3):
    k = torch.ones(1, 1, kernel_size, kernel_size)
    em = F.conv2d(x, k, padding=(1, 1)) / kernel_size ** 2
    em = torch.clamp(em, 0, 1)
    return x * (em == 1)


def ref_pipeline_grads(texture_layers, uv_grids, rgb, mask, angle_guidance,
                       angle_degrees, rounded_level, other_level, level_weight,
                       ref_loss, content_weight, style_weight,
                       use_angle_weight=True, use_depth_scaling=True):
    """Reference training-step semantics with backward hooks
    (model.py:178-270): returns (total, content, style, grads per layer)."""
    params = [torch.nn.Parameter(t) for t in texture_layers]
    total, content, style = ref_forward(
        params, uv_grids, rgb, mask, angle_guidance, angle_degrees,
        rounded_level, other_level, level_weight, ref_loss,
        content_weight, style_weight, use_angle_weight, use_depth_scaling)
    total.backward()
    return (float(total), content, style,
            [p.grad.detach().numpy().copy() for p in params])


def ref_forward(params, uv_grids, rgb, mask, angle_guidance,
                angle_degrees, rounded_level, other_level, level_weight,
                ref_loss, content_weight, style_weight,
                use_angle_weight=True, use_depth_scaling=True,
                tex_reg_weight=0.0, tex_reg_weights=None):
    """One reference forward on existing texture Parameters; returns the
    differentiable ``total`` (so a persistent torch.optim loop can drive
    multi-step trajectories) plus float content/style. Optionally adds the
    reference texture regularizer (model.py:163-171: weighted per-layer
    mean-square)."""
    pred_pyramid = []
    for uv in uv_grids:
        layers_sampled = []
        for p in params:
            layers_sampled.append(F.grid_sample(
                p.unsqueeze(0), uv, mode="bilinear", padding_mode="border",
                align_corners=True))
        pred_pyramid.append(torch.stack(layers_sampled).sum(0))

    if use_angle_weight:
        for p in pred_pyramid:
            def make_hook():
                def apply(grad):
                    a = F.interpolate(angle_guidance, grad.shape[2:], mode="bilinear")
                    return grad * a
                return apply
            p.register_hook(make_hook())

    def mask_depth(i, pimg):
        m1 = (rounded_level == i)
        m2 = (other_level == i)
        m = (m1.float() + m2.float()) * mask
        m = erode(m)
        m = F.interpolate(m, pimg.shape[2:], mode="nearest")
        return (m > 0).float()

    def mask_interp(i, pimg):
        m1 = erode((rounded_level == i).float() * mask) * level_weight
        m2 = erode((other_level == i).float() * mask) * (1 - level_weight)
        m = m1 + m2
        return F.interpolate(m, pimg.shape[2:], mode="nearest")

    if use_depth_scaling:
        pyramid_masks = [mask_depth(i, p) for i, p in enumerate(pred_pyramid)]
        interp_weights = [mask_interp(i, p) for i, p in enumerate(pred_pyramid)]
        for p, wmap in zip(pred_pyramid, interp_weights):
            def make_hook(wmap=wmap):
                def apply(grad):
                    return grad * wmap
                return apply
            p.register_hook(make_hook())
    else:
        pyramid_masks = [
            (F.interpolate(torch.zeros_like(mask), p.shape[2:], mode="nearest") > 0).float()
            for p in pred_pyramid
        ]
        pyramid_masks[-1] = (F.interpolate(mask, pred_pyramid[-1].shape[2:],
                                           mode="nearest") > 0).float()

    keep = [torch.sum(m) > 0 for m in pyramid_masks]
    pred_pyramid = [p for p, k in zip(pred_pyramid, keep) if k]
    pyramid_masks = [m for m, k in zip(pyramid_masks, keep) if k]

    style, content = ref_loss.forward(pred_pyramid, rgb, pyramid_masks,
                                      angle_degrees)
    total = content_weight * content + style_weight * style
    if tex_reg_weight > 0.0:
        # model.py:163-171 → texture.py:102-108 (weighted per-layer
        # mean-square over the pyramid; layer.data is the nn.Parameter
        # attribute of the module, so this is differentiable)
        reg = sum(torch.mean(torch.pow(p, 2.0)) * w
                  for p, w in zip(params, tex_reg_weights))
        total = total + tex_reg_weight * reg
    return total, float(content.detach()), float(style.detach())


class RefLoss:
    """Reference ContentAndStyleLoss semantics (B=1 only)."""

    def __init__(self, params, style_layers, content_layers, style_weights,
                 content_weights, angle_threshold=60.0,
                 style_pyramid_mode="single", gram_mode="current",
                 num_style_levels=5):
        self.params = params
        self.style_layers = list(style_layers)
        self.content_layers = list(content_layers)
        self.layers = self.style_layers + self.content_layers
        self.style_weights = list(style_weights)
        self.content_weights = list(content_weights)
        self.angle_threshold = angle_threshold
        self.style_pyramid_mode = style_pyramid_mode
        self.gram_mode = gram_mode
        self.gram_cache = {k: [] for k in self.style_layers}
        self.num_style_levels = num_style_levels
        self.style_targets = None

    def set_style_image(self, style_image, minimum_size=256):
        levels = list(range(self.num_style_levels))
        pyr = image_pyramid(style_image, levels, reverse=True,
                            minimum_size=minimum_size)
        pyr = [vgg_forward(self.params, p, self.style_layers) for p in pyr]
        self.style_targets = [
            {l: gram(pyr[k][layer]).detach() for k, l in enumerate(levels)}
            for layer in self.style_layers
        ]

    def forward(self, pred_pyramid, target_content, pyramid_masks,
                angle_degrees):
        pred = [vgg_forward(self.params, p, self.layers) for p in pred_pyramid]
        content_orig = vgg_forward(self.params, target_content, self.layers)

        last = len(pred) - 1
        factors, masks_p, masks_f, preds_p, preds_f, contents = [], [], [], [], [], []
        layer_names = set()
        for pi, enc in enumerate(pred):
            mask = pyramid_masks[pi]
            passed = F.interpolate(angle_degrees, mask.shape[2:],
                                   mode="bilinear") < self.angle_threshold
            fi, mip, mif, ppi, pfi, ci = {}, {}, {}, {}, {}, {}
            for k, o in enc.items():
                with torch.no_grad():
                    m = F.interpolate(mask, o.shape[2:], mode="nearest")
                    mp = F.interpolate(mask * passed, o.shape[2:], mode="nearest")
                    mf = F.interpolate(mask * (~passed), o.shape[2:], mode="nearest")
                    ct = F.interpolate(content_orig[k], o.shape[2:], mode="bilinear")
                    ci[k] = masked_features(ct, m)
                    if pi == last:
                        layer_names.add(k)
                    fi[k] = torch.mean(m)
                    mip[k] = mp
                    mif[k] = mf
                pred[pi][k] = masked_features(o, m)
                ppi[k] = masked_features(o, mp)
                pfi[k] = masked_features(o, mf)
            factors.append(fi)
            masks_p.append(mip)
            masks_f.append(mif)
            preds_p.append(ppi)
            preds_f.append(pfi)
            contents.append(ci)

        for k in layer_names:
            s = sum(factors[i][k] for i in range(len(pred)))
            for i in range(len(pred)):
                factors[i][k] = factors[i][k] / s

        mse = torch.nn.MSELoss()
        style_loss = torch.zeros(1)
        content_loss = torch.zeros(1)
        for pi in range(len(pred)):
            for li, layer in enumerate(self.style_layers):
                if self.style_pyramid_mode == "single":
                    y = self.style_targets[li][0]
                    y_hat = gram(pred[pi][layer])
                else:
                    y = self.style_targets[li][2]
                    y_hat = gram(preds_p[pi][layer])

                if self.gram_mode == "average":
                    self.gram_cache[layer] = self.gram_cache[layer][:9]
                    self.gram_cache[layer] = [g.detach() for g in self.gram_cache[layer]]
                    self.gram_cache[layer].insert(0, y_hat)
                    y_hat = torch.mean(torch.stack(self.gram_cache[layer]), dim=0)

                f = factors[pi][layer]
                l = self.style_weights[li] * f * mse(y, y_hat)
                if self.style_pyramid_mode == "multi":
                    y_hat_f = gram(preds_f[pi][layer])
                    if torch.sum(masks_f[pi][layer]) > 0:
                        l = l + self.style_weights[li] * f * mse(y, y_hat_f)
                    if li > 2:
                        y_smaller = self.style_targets[li][0]
                        l = l + self.style_weights[li] * f * mse(y_smaller, y_hat)
                style_loss = style_loss + l

            for li, layer in enumerate(self.content_layers):
                l = self.content_weights[li] * factors[pi][layer] * mse(
                    contents[pi][layer], pred[pi][layer])
                content_loss = content_loss + l

        return style_loss, content_loss
