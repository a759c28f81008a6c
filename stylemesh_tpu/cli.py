"""Command-line interface, flag-compatible with the reference
(/root/reference/model/optimize.py:238-290) plus TPU-specific flags.

Run as ``python -m stylemesh_tpu.cli --style_image_path ... --root_path ...``
or via a preset: ``python -m stylemesh_tpu.cli --preset scannet_full``.
"""

import argparse
import os

import jax.numpy as jnp

from stylemesh_tpu.models.losses import (
    DEFAULT_CONTENT_LAYERS,
    DEFAULT_CONTENT_WEIGHTS,
    DEFAULT_STYLE_LAYERS,
    DEFAULT_STYLE_WEIGHTS,
)
from stylemesh_tpu.models.pipeline import PipelineConfig
from stylemesh_tpu.optimize import RunConfig, render_styled_frames, run_training
from stylemesh_tpu.presets import PRESETS, apply_preset, explicit_cli_keys


def build_parser():
    p = argparse.ArgumentParser("stylemesh_tpu.optimize")
    # dataset / run flags (reference :244-269)
    p.add_argument("--root_path", default="")
    p.add_argument("--dataset", default="scannet", choices=["scannet", "matterport"])
    p.add_argument("--matterport_region_index", default=0, type=int)
    p.add_argument("--train_split", default=0.8, type=float)
    p.add_argument("--val_split", default=0.2, type=float)
    p.add_argument("--split_mode", default="sequential", choices=["folder", "sequential"])
    p.add_argument("--scene", default="")
    p.add_argument("--max_images", default=-1, type=int)
    p.add_argument("--min_images", default=1, type=int)
    p.add_argument("--resize_size", default=256, type=int)
    p.add_argument("--texture_size", default="512,512",
                   type=lambda s: [int(f) for f in s.split(",")])
    p.add_argument("--hierarchical", default=False, action="store_true")
    p.add_argument("--hierarchical_layers", default=4, type=int)
    p.add_argument("--random_texture_init", default=False, action="store_true")
    p.add_argument("--batch_size", default=1, type=int,
                   help="views per jitted step (reference: always 1)")
    p.add_argument("--learning_rate", default=1.0, type=float)
    p.add_argument("--loss_weight", action="append",
                   type=lambda kv: kv.split("="), dest="loss_weights")
    p.add_argument("--tex_reg_weight", action="append",
                   type=lambda kv: kv.split("="), dest="tex_reg_weights")
    p.add_argument("--decay_gamma", default=0.1, type=float)
    p.add_argument("--decay_step_size", default=30, type=int)
    p.add_argument("--num_workers", default=4, type=int,
                   help="accepted for reference-compat; the packed scene cache "
                        "makes loader workers unnecessary")
    p.add_argument("--log_images_nth", default=-1, type=int)
    p.add_argument("--save_texture", default=False, action="store_true")
    p.add_argument("--shuffle", default=False, action="store_true")
    p.add_argument("--sampler_mode", default="repeat",
                   choices=["random", "sequential", "repeat"])
    p.add_argument("--index_repeat", default=1, type=int)
    p.add_argument("--max_epochs", default=1, type=int)
    p.add_argument("--log_dir", default="runs")

    # style-transfer flags (reference :272-285)
    p.add_argument("--vgg_gatys_model_path", default="", type=str)
    p.add_argument("--style_image_path", action="append", default=None,
                   type=str,
                   help="repeatable: N paths run an N-style sweep — one "
                        "texture per style, style axis sharded over the "
                        "chips (parallel/multistyle.py)")
    p.add_argument("--style_dir", default="", type=str,
                   help="optimize one texture per image in this directory "
                        "(the reference's 120styles workflow), style axis "
                        "over the chips; merged with --style_image_path")
    p.add_argument("--style_layers", type=lambda s: s.split(","),
                   default=list(DEFAULT_STYLE_LAYERS))
    p.add_argument("--content_layers", type=lambda s: s.split(","),
                   default=list(DEFAULT_CONTENT_LAYERS))
    p.add_argument("--style_weights", type=lambda s: [float(f) for f in s.split(",")],
                   default=list(DEFAULT_STYLE_WEIGHTS))
    p.add_argument("--content_weights", type=lambda s: [float(f) for f in s.split(",")],
                   default=list(DEFAULT_CONTENT_WEIGHTS))
    p.add_argument("--no_angle_weight", default=False, action="store_true")
    p.add_argument("--no_depth_scaling", default=False, action="store_true")
    p.add_argument("--angle_threshold", default=60.0, type=float)
    p.add_argument("--pyramid_levels", default=8, type=int)
    p.add_argument("--min_pyramid_depth", default=0.25, type=float)
    p.add_argument("--min_pyramid_height", default=32, type=int)
    p.add_argument("--style_pyramid_mode", default="single", choices=["single", "multi"])
    p.add_argument("--gram_mode", default="current", choices=["current", "average"])
    p.add_argument("--renderer_mipmap", default=None, type=str,
                   help="accepted for reference-compat; post-train rendering "
                        "is built in (texture sampling at baked UVs)")

    # TPU-native flags
    p.add_argument("--preset", default=None, choices=sorted(PRESETS.keys()))
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax platform (this image pins the TPU via "
                        "sitecustomize, so JAX_PLATFORMS env has no effect)")
    p.add_argument("--data_parallel", default=False, action="store_true",
                   help="shard the view batch across all visible chips")
    p.add_argument("--shard_atlas", default=False, action="store_true",
                   help="row-band the texture atlas (and Adam moments) "
                        "across the chips: banded Pallas plans, psum'd "
                        "gathers, band-local splats (parallel/atlas.py). "
                        "For atlases too big to replicate (8k/16k, "
                        "hierarchical 4096²)")
    p.add_argument("--no_dynamic_level_skip", default=False,
                   action="store_true",
                   help="disable per-batch level specialization (skipping "
                        "pyramid levels that are empty or gradient-dead for "
                        "the whole batch, one specialized compile per "
                        "observed signature — the jit analogue of the "
                        "reference dropping empty levels per step)")
    p.add_argument("--bfloat16", default=False, action="store_true",
                   help="bfloat16 VGG compute (MXU full rate)")
    p.add_argument("--kernel_compute", default="bf16", choices=["f32", "bf16"],
                   help="splat/gather kernel math; bf16 is ~22%% faster and "
                        "tracks f32 to 5e-5 relative loss "
                        "(tools/bf16_quality_check.py)")
    p.add_argument("--remat_min_px", default=600_000, type=int,
                   help="recompute-in-backward only pyramid levels with >= "
                        "this many pixels (the HBM peak); 0 remats every "
                        "level (slower, lowest memory)")
    p.add_argument("--remat_vgg", default="auto",
                   choices=["auto", "on", "off"],
                   help="rematerialize VGG activations in the backward. "
                        "'auto' disables it up to batch_size 4 under "
                        "--bfloat16 (the fused gram kernel freed enough HBM "
                        "that the recompute only costs time there, "
                        "tools/hbm_probe.py) and up to batch_size 2 in f32, "
                        "where that kernel does not engage")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--no_post_steps", default=False, action="store_true")
    p.add_argument("--tb_logs", default=False, action="store_true",
                   help="also write TensorBoard event files (scalars + image "
                        "grids; utils/tb_events.py — no TF dependency)")
    return p


def configs_from_args(args):
    loss_weights = {l[0]: float(l[1]) for l in (args.loss_weights or [])}
    tex_reg_weights = None
    if args.tex_reg_weights:
        d = {int(w[0]): float(w[1]) for w in args.tex_reg_weights}
        tex_reg_weights = tuple(d[i] for i in range(len(d)))

    pipe = PipelineConfig(
        texture_width=args.texture_size[0],
        texture_height=args.texture_size[1],
        hierarchical_layers=args.hierarchical_layers if args.hierarchical else 1,
        random_texture_init=args.random_texture_init,
        style_layers=tuple(args.style_layers),
        content_layers=tuple(args.content_layers),
        style_weights=tuple(args.style_weights),
        content_weights=tuple(args.content_weights),
        use_angle_weight=not args.no_angle_weight,
        use_depth_scaling=not args.no_depth_scaling,
        angle_threshold=args.angle_threshold,
        style_pyramid_mode=args.style_pyramid_mode,
        gram_mode=args.gram_mode,
        content_weight=loss_weights.get("content", 0.0),
        style_weight=loss_weights.get("style", 0.0),
        tex_reg_weight=loss_weights.get("tex_reg", 0.0),
        tex_reg_weights=tex_reg_weights,
        learning_rate=args.learning_rate,
        decay_gamma=args.decay_gamma,
        decay_step_size=args.decay_step_size,
        compute_dtype=jnp.bfloat16 if args.bfloat16 else None,
        kernel_compute=args.kernel_compute,
        remat_min_px=args.remat_min_px,
        # auto: the fused gram kernel only frees HBM when kernels run in
        # bf16, so the no-remat batch window is narrower under f32
        # (ADVICE r2: dtype-aware rule prevents f32 OOM at batch 3-4)
        remat_vgg=((args.batch_size > 4 if args.bfloat16
                    else args.batch_size > 2)
                   if args.remat_vgg == "auto"
                   else args.remat_vgg == "on"),
    )
    style_paths = list(args.style_image_path or [])
    if args.style_dir:
        exts = (".jpg", ".jpeg", ".png", ".bmp")
        style_paths += sorted(
            os.path.join(args.style_dir, f)
            for f in os.listdir(args.style_dir)
            if f.lower().endswith(exts))
    if not style_paths:
        style_paths = [""]

    run = RunConfig(
        root_path=args.root_path,
        dataset=args.dataset,
        matterport_region_index=args.matterport_region_index,
        scene=args.scene,
        min_images=args.min_images,
        max_images=args.max_images,
        resize_size=args.resize_size,
        pyramid_levels=args.pyramid_levels,
        min_pyramid_depth=args.min_pyramid_depth,
        min_pyramid_height=args.min_pyramid_height,
        train_split=args.train_split,
        val_split=args.val_split,
        split_mode=args.split_mode,
        sampler_mode=args.sampler_mode,
        index_repeat=args.index_repeat,
        shuffle=args.shuffle,
        max_epochs=args.max_epochs,
        views_per_batch=args.batch_size,
        data_parallel=args.data_parallel,
        shard_atlas=args.shard_atlas,
        dynamic_level_skip=not args.no_dynamic_level_skip,
        extra_style_paths=tuple(style_paths[1:]),
        save_texture=args.save_texture,
        log_images_nth=args.log_images_nth,
        log_dir=args.log_dir,
        tb_logs=args.tb_logs,
        vgg_model_path=args.vgg_gatys_model_path,
        style_image_path=style_paths[0],
        seed=args.seed,
        run_post_steps=not args.no_post_steps,
    )
    return run, pipe


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    import jax

    # Persistent compile cache: the full-method train-step graph takes
    # minutes to compile cold; caching it makes every later run of the same
    # config start in seconds (JAX_COMPILATION_CACHE_DIR overrides).
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        cache_dir = os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache")
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except (OSError, AttributeError):
            pass  # read-only home / older jax: run without the cache
    if args.platform:
        try:
            jax.config.update(
                "jax_platforms", "cpu" if args.platform == "cpu" else "")
        except RuntimeError:
            pass  # backend already initialized
    if args.preset:
        args = apply_preset(args, args.preset,
                            explicit=explicit_cli_keys(build_parser, argv))
    run, pipe_cfg = configs_from_args(args)

    state, log_dir, cache = run_training(run, pipe_cfg)

    if run.run_post_steps:
        from stylemesh_tpu.eval.reprojection import eval_reprojection_consistency
        from stylemesh_tpu.optimize import (_export_textures, _write_wallclock,
                                            build_lpips)
        from stylemesh_tpu.texturing.video import video_from_files
        from stylemesh_tpu.utils.profiling import StepProfiler

        clock = StepProfiler()
        # the reference always reports LPIPS alongside MSE
        # (eval_image_folders.py:237-242); lpips_calibrated in the JSON says
        # whether converted lin weights were found
        lpips_fn = build_lpips(run.vgg_model_path)
        # one post chain per optimized texture (multi-style sweeps produce S)
        for s, tex in _export_textures(state):
            tag = "" if s is None else f"_style{s}"
            styled_dir = os.path.join(log_dir, "styled" + tag)
            with clock.phase("post_render"):
                frames = render_styled_frames(tex, cache, styled_dir)
            with clock.phase("post_video"):
                video_from_files(frames,
                                 os.path.join(log_dir, f"styled{tag}.mp4"))
            with clock.phase("post_eval"):
                results = eval_reprojection_consistency(
                    cache, styled_dir, out_dir=log_dir, seed=42,
                    lpips_fn=lpips_fn, suffix=tag)
            print(f"reprojection eval{tag}:", results)
        _write_wallclock(log_dir, clock.summary())
        print("post-chain wall-clock:",
              {k: v["total_s"] for k, v in clock.summary().items()})
    return state, log_dir


if __name__ == "__main__":
    main()
