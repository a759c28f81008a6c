"""Preset fidelity: each preset must resolve to exactly the flag set of the
corresponding reference launch script (/root/reference/scripts/train/*.sh).

The expected values below are transcribed verbatim from the scripts (one
column per script); in particular ``--style_weights="1000,1000,10,10,1000"``
is consumed *raw* by the reference argparse (optimize.py), overriding the
1e3/n^2 ContentAndStyleLoss defaults, so presets must carry the raw values.
"""

import pytest

from stylemesh_tpu.cli import build_parser, configs_from_args
from stylemesh_tpu.presets import PRESETS, apply_preset, explicit_cli_keys

RAW_STYLE_WEIGHTS = (1000.0, 1000.0, 10.0, 10.0, 1000.0)

# preset -> (loss_style, tex_reg, decay_step, epochs, repeat, pyr_mode,
#            gram_mode, angle_thr, pyr_levels, min_pyr_depth, layers,
#            depth_scaling, angle_weight)
SCRIPT_TABLE = {
    "scannet_dip":           (1e-3, 0.0, 15, 1, 1,   "single", "average", 3000.0, 1, 0.25, 1, False, False),
    "scannet_only2d":        (1e-4, 5e3, 3,  7, 20,  "single", "current", 3000.0, 1, 0.25, 4, False, False),
    "scannet_with_angle":    (1e-4, 5e3, 3,  7, 20,  "multi",  "current", 30.0,   1, 0.25, 4, False, True),
    "scannet_full":          (1e-4, 5e3, 3,  7, 20,  "multi",  "current", 30.0,   4, 0.25, 4, True,  True),
    "matterport_dip":        (1e-4, 0.0, 50, 1, 1,   "single", "average", 3000.0, 1, 0.25, 1, False, False),
    "matterport_only2d":     (1e-4, 5e3, 3,  7, 100, "single", "current", 3000.0, 1, 0.2,  4, False, False),
    "matterport_with_angle": (1e-4, 5e3, 3,  7, 100, "multi",  "current", 40.0,   1, 0.2,  4, False, True),
    "matterport_full":       (1e-4, 5e3, 3,  7, 100, "multi",  "current", 40.0,   4, 0.2,  4, True,  True),
}


def _resolve(preset, extra=()):
    argv = ["--preset", preset, *extra]
    args = build_parser().parse_args(argv)
    args = apply_preset(args, preset,
                        explicit=explicit_cli_keys(build_parser, argv))
    return configs_from_args(args)


@pytest.mark.parametrize("preset", sorted(SCRIPT_TABLE))
def test_preset_matches_reference_script(preset):
    (style_w, tex_reg, decay, epochs, repeat, pyr_mode, gram_mode, angle_thr,
     pyr_levels, min_depth, layers, depth_scaling, angle_weight) = SCRIPT_TABLE[preset]
    run, pipe = _resolve(preset)

    # flags shared by all 8 scripts
    assert run.resize_size == 256
    assert (pipe.texture_width, pipe.texture_height) == (4096, 4096)
    assert run.min_images == 1 and run.max_images == 1000
    assert pipe.learning_rate == 1.0
    assert (run.train_split, run.val_split) == (0.99, 0.01)
    assert run.sampler_mode == "repeat" and run.split_mode == "sequential"
    assert run.min_pyramid_height == 256
    assert pipe.content_weight == 7e1
    assert pipe.style_weights == RAW_STYLE_WEIGHTS
    assert run.save_texture

    # per-script flags
    assert pipe.style_weight == style_w
    assert pipe.tex_reg_weight == tex_reg
    assert pipe.decay_step_size == decay
    assert run.max_epochs == epochs
    assert run.index_repeat == repeat
    assert pipe.style_pyramid_mode == pyr_mode
    assert pipe.gram_mode == gram_mode
    assert pipe.angle_threshold == angle_thr
    assert run.pyramid_levels == pyr_levels
    assert run.min_pyramid_depth == min_depth
    assert pipe.hierarchical_layers == layers
    assert pipe.use_depth_scaling is depth_scaling
    assert pipe.use_angle_weight is angle_weight
    assert run.dataset == ("matterport" if preset.startswith("matterport")
                           else "scannet")


def test_explicit_cli_flags_beat_preset():
    run, pipe = _resolve("scannet_full",
                         ["--index_repeat", "5", "--max_epochs", "1",
                          "--angle_threshold", "45"])
    assert run.index_repeat == 5
    assert run.max_epochs == 1
    assert pipe.angle_threshold == 45.0
    # untouched preset values still apply
    assert pipe.style_pyramid_mode == "multi"
    assert pipe.style_weights == RAW_STYLE_WEIGHTS


def test_all_presets_listed():
    assert set(PRESETS) == set(SCRIPT_TABLE)
