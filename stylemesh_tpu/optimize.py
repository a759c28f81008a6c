"""Training orchestration — the ``python -m model.optimize`` equivalent.

Mirrors /root/reference/model/optimize.py:28-234: build the dataset, the
style image and the pipeline; run the epoch loop (train + val) with per-epoch
texture export; then chain the post-steps (styled-frame rendering, video
assembly, reprojection evaluation).

TPU deltas: views are batched per jitted step (``--views_per_batch``), the
scene is packed once into a host cache, the optimizer is view-data-parallel
across all visible chips when ``--data_parallel`` is set, and the post-train
"mipmap render" (a native GL renderer in the reference) becomes texture
sampling at the baked base-resolution UV maps.
"""

import dataclasses
import json
import os
import time
from os.path import join
from typing import Optional

import numpy as np

from stylemesh_tpu.data.loading import SceneCache
from stylemesh_tpu.data.sampling import batched, epoch_indices, make_split
from stylemesh_tpu.data.scenes import (
    discover_matterport_regions,
    discover_scannet_scenes,
    select_scene,
)
from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
from stylemesh_tpu.utils.checkpoint import (
    save_texture_image,
    save_texture_layers,
    save_texture_npz,
)
from stylemesh_tpu.utils.logging import MetricsLogger, StepTimer
from stylemesh_tpu.utils.profiling import StepProfiler


def _write_wallclock(log_dir, phases):
    """Merge phase timings into <log_dir>/wallclock.json (the post chain
    appends its phases to the same file)."""
    path = join(log_dir, "wallclock.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing.update(phases)
    with open(path, "w") as f:
        json.dump(existing, f, indent=2)


@dataclasses.dataclass
class RunConfig:
    """Run-level options beyond PipelineConfig (dataset, schedule, IO)."""

    root_path: str = ""
    dataset: str = "scannet"  # 'scannet' | 'matterport'
    matterport_region_index: int = 0
    scene: str = ""
    min_images: int = 1
    max_images: int = -1
    resize_size: int = 256
    pyramid_levels: int = 8
    min_pyramid_depth: float = 0.25
    min_pyramid_height: int = 32
    train_split: float = 0.8
    val_split: float = 0.2
    split_mode: str = "sequential"
    sampler_mode: str = "repeat"
    index_repeat: int = 1
    shuffle: bool = False
    max_epochs: int = 1
    views_per_batch: int = 1
    data_parallel: bool = False
    shard_atlas: bool = False  # row-band the atlas + Adam over the chips
    # per-batch level specialization: compile a specialized train step for
    # each observed batch-level signature (levels empty for the whole batch
    # skipped, gradient-dead levels stop-gradded) — the jit analogue of the
    # reference dropping empty levels per step (model.py:256-257)
    dynamic_level_skip: bool = True
    # extra styles beyond style_image_path -> one texture per style, style
    # axis sharded over the chips (parallel/multistyle.py)
    extra_style_paths: tuple = ()
    save_texture: bool = True
    log_images_nth: int = -1  # save pred/rgb/mask image grids every N steps
    checkpoint_every_steps: int = 0  # 0 = only per-epoch texture exports
    resume_from: str = ""  # orbax checkpoint dir to restore
    log_dir: str = "runs"
    tb_logs: bool = False  # also write TensorBoard event files
    vgg_model_path: str = ""
    style_image_path: str = ""
    seed: int = 0
    run_post_steps: bool = True


def load_style_image(path, max_size=2048):
    """Style image -> [1, H, W, 3] Gatys-preprocessed (optimize.py:118-126)."""
    from PIL import Image

    from stylemesh_tpu.data.loading import gatys_pre_np

    Image.MAX_IMAGE_PIXELS = 933120000
    img = Image.open(path).convert("RGB")
    if img.size[0] > max_size or img.size[1] > max_size:
        # torchvision Resize(2048): shorter side -> 2048
        w, h = img.size
        if w < h:
            img = img.resize((max_size, round(h * max_size / w)),
                             Image.Resampling.BILINEAR)
        else:
            img = img.resize((round(w * max_size / h), max_size),
                             Image.Resampling.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return gatys_pre_np(arr)[None]


def load_vgg(path):
    """Load VGG weights from a converted .npz, a torch vgg_conv.pth, or fall
    back to random params (weight-free smoke runs)."""
    from stylemesh_tpu.models.vgg import (
        convert_torch_state_dict,
        init_vgg_params,
        load_vgg_params,
    )

    if path and path.endswith(".npz") and os.path.exists(path):
        return load_vgg_params(path)
    if path and os.path.exists(path):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return convert_torch_state_dict({k: v.numpy() for k, v in sd.items()})
    print("WARNING: no VGG weights found — using random init "
          "(style quality will be meaningless; timing is representative).")
    return init_vgg_params(rng=0)


def build_lpips(vgg_model_path="", lpips_weights=""):
    """LPIPS distance for the eval chain (reference always computes
    LPIPS-VGG, eval_image_folders.py:237-242).

    Calibrated lin weights are loaded from ``lpips_weights``, the
    ``STYLEMESH_LPIPS_WEIGHTS`` env var, or an ``lpips_lin.npz`` next to the
    VGG weights file — otherwise the structurally-identical uncalibrated
    fallback runs and the result JSON carries ``lpips_calibrated: false``
    (numbers are then NOT comparable to the paper's)."""
    from stylemesh_tpu.eval.lpips import LPIPSDistance

    candidates = [lpips_weights, os.environ.get("STYLEMESH_LPIPS_WEIGHTS", "")]
    if vgg_model_path:
        candidates.append(join(os.path.dirname(vgg_model_path), "lpips_lin.npz"))
    lin = None
    for c in candidates:
        if c and os.path.exists(c):
            lin = LPIPSDistance.load_lin_weights(c)
            break
    return LPIPSDistance(load_vgg(vgg_model_path), lin_weights=lin)


def discover_scene(run: RunConfig):
    kw = dict(pyramid_levels=run.pyramid_levels,
              min_pyramid_height=run.min_pyramid_height,
              min_pyramid_depth=run.min_pyramid_depth)
    if run.dataset == "scannet":
        scenes = discover_scannet_scenes(join(run.root_path, "train/images"), **kw)
    elif run.dataset == "matterport":
        scenes = discover_matterport_regions(
            join(run.root_path, "v1/scans"),
            region_index=run.matterport_region_index, **kw)
    else:
        raise ValueError(f"Unsupported dataset: {run.dataset}")
    return select_scene(scenes, name=run.scene or None,
                        min_images=run.min_images, max_images=run.max_images,
                        seed=run.seed)


def view_level_tables(scene_cache, pipe_cfg: PipelineConfig):
    """Per-view pyramid-level liveness: two ``[num_views, num_levels]`` bool
    tables ``(loss_live, grad_live)``.

    ``loss_live[v, i]``: view v has at least one live loss pixel at level i
    (with depth scaling: (rounded|other depth level == i) & uv-mask, the raw
    mask behind pipeline.depth_pyramid_masks; without it only the last level
    carries loss by construction, model.py:253-254).

    ``grad_live[v, i]``: the level's gradient reweighting may be nonzero for
    some pixel of view v (conservative analysis, data/grad_masks.py); None
    when no reweighting is active (everything may be live).

    Column-ANY over all views gives the scene-wide static decisions
    (:func:`scene_skip_levels` / :func:`scene_grad_dead_levels`); row-ANY
    over a batch's views gives the per-batch specialization signature
    (run_training's dynamic level skip)."""
    b = scene_cache._batch_all
    n = len(b.uv)
    mask = np.asarray(b.mask) > 0
    v = mask.shape[0]
    if pipe_cfg.use_depth_scaling:
        rounded = np.asarray(b.rounded_depth_level)
        other = np.asarray(b.other_depth_level)
        loss_live = np.stack(
            [(((rounded == i) | (other == i)) & mask).reshape(v, -1).any(axis=1)
             for i in range(n)], axis=1)
    else:
        loss_live = np.zeros((v, n), bool)
        if n:
            loss_live[:, -1] = True

    from stylemesh_tpu.data.grad_masks import grad_weight_masks

    level_shapes = [tuple(u.shape[1:3]) for u in b.uv]
    masks = grad_weight_masks(b, level_shapes, pipe_cfg.use_angle_weight,
                              pipe_cfg.use_depth_scaling)
    grad_live = None if masks is None else np.stack(
        [m.reshape(v, -1).any(axis=1) for m in masks], axis=1)
    return loss_live, grad_live


def scene_skip_levels(scene_cache, pipe_cfg: PipelineConfig, tables=None):
    """Pyramid levels with no live loss pixel in ANY view of the scene.

    If the raw loss mask is empty scene-wide, every derived mask and gradient
    weight is exactly zero, so the level can be skipped at trace time
    (shallow real scans never populate the near levels). This is the
    static-compile analogue of the reference dropping empty levels per step
    (model.py:256-257). ``tables``: a precomputed
    :func:`view_level_tables` result, to share the analysis."""
    loss_live, _ = tables or view_level_tables(scene_cache, pipe_cfg)
    return tuple(i for i in range(loss_live.shape[1])
                 if not loss_live[:, i].any())


def scene_grad_dead_levels(scene_cache, pipe_cfg: PipelineConfig,
                           tables=None):
    """Pyramid levels whose gradient weight is an exact zero at every pixel
    of every view (conservative scene-wide analysis, data/grad_masks.py) —
    their loss value still counts but their backward is dead compute; the
    pipeline wraps them in stop_gradient (PipelineConfig.stop_grad_levels).
    Far levels of real scans commonly land here (the splat planner already
    builds zero splat entries for them)."""
    _, grad_live = tables or view_level_tables(scene_cache, pipe_cfg)
    if grad_live is None:
        return ()
    return tuple(i for i in range(grad_live.shape[1])
                 if not grad_live[:, i].any())


def run_training(run: RunConfig, pipe_cfg: PipelineConfig,
                 scene_cache: Optional[SceneCache] = None,
                 vgg_params=None, style_image=None):
    """The full optimization loop. Returns (state, log_dir, scene_cache)."""
    import jax

    os.makedirs(run.log_dir, exist_ok=True)
    version = len([d for d in os.listdir(run.log_dir) if d.startswith("version_")])
    log_dir = join(run.log_dir, f"version_{version}")
    os.makedirs(log_dir, exist_ok=True)
    logger = MetricsLogger(log_dir, tb=run.tb_logs)

    n_dev = len(jax.devices())
    shard_atlas = run.shard_atlas and n_dev > 1
    multi_style = len(run.extra_style_paths) > 0
    if run.shard_atlas and run.data_parallel:
        raise ValueError("--shard_atlas and --data_parallel are exclusive "
                         "(the atlas axis uses the whole mesh)")
    if multi_style and (run.shard_atlas or run.data_parallel):
        raise ValueError("multi-style sweeps use the whole mesh for the "
                         "style axis; drop --shard_atlas/--data_parallel")

    # wall-clock anatomy of the whole run (scene -> plan -> compile -> steps
    # -> post): written to <log_dir>/wallclock.json so time-to-styled-scene
    # is a first-class, auditable number, not prose
    clock = StepProfiler()
    if scene_cache is None:
        spec = discover_scene(run)
        print(f"Using scene: {spec.name}")
        with clock.phase("scene_cache"):
            scene_cache = SceneCache(spec, resize_size=run.resize_size,
                                     verbose=True)
    # statically-empty pyramid levels: decided BEFORE planning so skipped
    # levels are never planned, cached, sliced, or device-transferred
    tables = loss_live, grad_live = view_level_tables(scene_cache, pipe_cfg)
    n_levels = loss_live.shape[1]
    skip = tuple(sorted(set(scene_skip_levels(scene_cache, pipe_cfg, tables))
                        | set(pipe_cfg.skip_levels)))
    if skip:
        print(f"pyramid levels empty for every view — statically skipped: "
              f"{list(skip)}")
        pipe_cfg = dataclasses.replace(pipe_cfg, skip_levels=skip)
    dead = tuple(sorted(
        (set(scene_grad_dead_levels(scene_cache, pipe_cfg, tables))
         | set(pipe_cfg.stop_grad_levels)) - set(skip)))
    if dead:
        print(f"pyramid levels with provably-zero gradients — backward "
              f"deleted (value kept): {list(dead)}")
        pipe_cfg = dataclasses.replace(pipe_cfg, stop_grad_levels=dead)

    if pipe_cfg.use_splat_kernel and not getattr(scene_cache, "_view_plans", None):
        layer_sizes = [
            (pipe_cfg.texture_height // 2 ** i, pipe_cfg.texture_width // 2 ** i)
            for i in range(pipe_cfg.hierarchical_layers)
        ]
        with clock.phase("splat_planning"):
            scene_cache.attach_splat_plans(
                layer_sizes, use_angle_weight=pipe_cfg.use_angle_weight,
                use_depth_scaling=pipe_cfg.use_depth_scaling,
                n_bands=n_dev if shard_atlas else 1,
                skip_levels=pipe_cfg.skip_levels)
    if vgg_params is None:
        vgg_params = load_vgg(run.vgg_model_path)
    if style_image is None:
        style_image = load_style_image(run.style_image_path)

    train_idx, val_idx = make_split(
        scene_cache.num_views, split=(run.train_split, run.val_split),
        split_mode=run.split_mode, shuffle=run.shuffle, seed=run.seed)

    steps_per_epoch = max(
        1, len(epoch_indices(train_idx, run.sampler_mode, run.index_repeat))
        // run.views_per_batch)
    pipe_cfg = dataclasses.replace(pipe_cfg, steps_per_epoch=steps_per_epoch)

    with clock.phase("pipeline_build"):
        if multi_style:
            from stylemesh_tpu.parallel.multistyle import MultiStylePipeline

            style_images = [jax.numpy.asarray(style_image)] + [
                jax.numpy.asarray(load_style_image(p))
                for p in run.extra_style_paths]
            print(f"multi-style sweep: {len(style_images)} styles over "
                  f"{n_dev} chip(s)")
            pipe = MultiStylePipeline(pipe_cfg, vgg_params, style_images)
        elif shard_atlas:
            from stylemesh_tpu.parallel.atlas import AtlasShardedPipeline

            print(f"atlas-sharded training: texture row-banded over "
                  f"{n_dev} chips")
            pipe = AtlasShardedPipeline(pipe_cfg, vgg_params,
                                        jax.numpy.asarray(style_image))
        elif run.data_parallel and n_dev > 1:
            from stylemesh_tpu.parallel.train import ShardedTexturePipeline

            pipe = ShardedTexturePipeline(pipe_cfg, vgg_params,
                                          jax.numpy.asarray(style_image))
        else:
            pipe = TexturePipeline(pipe_cfg, vgg_params,
                                   jax.numpy.asarray(style_image))
        state = pipe.init()
    if run.resume_from:
        if multi_style:
            raise ValueError("--resume_from is not supported for "
                             "multi-style sweeps yet")
        from stylemesh_tpu.utils.checkpoint import restore_train_state

        state = restore_train_state(state, run.resume_from)
        print(f"resumed from {run.resume_from} at step {int(state.step)}")

    # reproducibility capture (reference optimize.py:93-102)
    with open(join(log_dir, "run_config.json"), "w") as f:
        json.dump({
            "run": dataclasses.asdict(run),
            "pipeline": {k: str(v) for k, v in dataclasses.asdict(pipe_cfg).items()},
            "indices": {"train": train_idx, "val": val_idx},
            "selected_scene": scene_cache.spec.name,
            "levels": [float(l) for l in scene_cache.levels],
        }, f, indent=2)

    timer = StepTimer()

    # Per-batch level specialization ("dynamic level skip"): the reference
    # drops pyramid levels with an empty loss mask from every step at
    # runtime (model.py:256-257). Under jit the level set is a trace-time
    # constant, so the equivalent is one specialized step per observed
    # batch-level signature: levels empty for EVERY view of the batch are
    # skipped at trace time, levels live but gradient-dead for the whole
    # batch keep their loss value and lose their backward (stop_grad_levels).
    # Both transformations reproduce the full step's losses and texture
    # trajectory exactly (tests/test_pipeline.py); each signature costs one
    # extra compile (disk-cached), and the repeat sampler makes signatures
    # few and long-lived.
    specialize = (run.dynamic_level_skip and not multi_style
                  and not shard_atlas and type(pipe).__name__
                  in ("TexturePipeline", "ShardedTexturePipeline"))
    base_sig = (pipe_cfg.skip_levels, pipe_cfg.stop_grad_levels)
    spec_pipes = {}
    MAX_SPECIALIZATIONS = 8

    def pipe_for_chunk(chunk):
        if not specialize:
            return pipe
        # chunk entries are dataset indices; the liveness tables are in
        # cache order (scene_cache.get_batch does the same mapping)
        views = [scene_cache._pos_of[i] for i in chunk]
        live = loss_live[views].any(axis=0)
        glive = (grad_live[views].any(axis=0) if grad_live is not None
                 else np.ones(n_levels, bool))
        # union with the configured level sets: liveness can only ADD skips
        # on top of caller/scene-level decisions, never revive a level the
        # config explicitly disabled
        sig_skip = tuple(i for i in range(n_levels)
                         if not live[i] or i in pipe_cfg.skip_levels)
        sig_sg = tuple(i for i in range(n_levels) if i not in sig_skip
                       and (not glive[i] or i in pipe_cfg.stop_grad_levels))
        sig = (sig_skip, sig_sg)
        if sig == base_sig:
            return pipe
        spec = spec_pipes.get(sig)
        if spec is None:
            if len(spec_pipes) >= MAX_SPECIALIZATIONS:
                return pipe
            print(f"batch level signature skip={list(sig[0])} "
                  f"stop_grad={list(sig[1])}: specializing step")
            cfg2 = dataclasses.replace(pipe_cfg, skip_levels=sig[0],
                                       stop_grad_levels=sig[1])
            kw = dict(style_targets=pipe.style_targets)
            if hasattr(pipe, "mesh"):
                kw["mesh"] = pipe.mesh
            spec = type(pipe)(cfg2, vgg_params,
                              jax.numpy.asarray(style_image), **kw)
            spec_pipes[sig] = spec
        return spec

    # chunk -> device-resident batch + precomputed aux: with the repeat
    # sampler the same views recur for index_repeat consecutive steps, so
    # host assembly + H2D + the batch-constant step work (content VGG pass,
    # mask/factor resizes) amortize to ~zero (the reference pays DataLoader
    # decode AND recomputes those constants every step)
    last_chunk, last_batch, last_aux = None, None, None

    def get_device_batch(chunk):
        nonlocal last_chunk, last_batch, last_aux
        key = tuple(chunk)
        if key != last_chunk:
            last_batch = jax.device_put(scene_cache.get_batch(chunk))
            last_aux = pipe_for_chunk(chunk).prepare_batch(last_batch)
            last_chunk = key
        return last_batch, last_aux

    host_step = int(state.step)  # host-side twin of state.step (see below)
    first_step_done = False
    t_train0 = time.perf_counter()
    for epoch in range(run.max_epochs):
        if run.sampler_mode == "repeat" and isinstance(run.index_repeat, int) \
                and run.index_repeat > 1:
            from stylemesh_tpu.data.sampling import batched_repeat

            chunks = batched_repeat(train_idx, run.views_per_batch,
                                    run.index_repeat)
        else:
            stream = epoch_indices(train_idx, run.sampler_mode,
                                   run.index_repeat, seed=run.seed + epoch)
            chunks = batched(stream, run.views_per_batch)
        # loss logging is deferred by one step: float(v) on a fresh step
        # output would block until the step finishes, serializing host
        # dispatch into the device timeline (~27% step time measured). The
        # step counter is tracked host-side for the same reason.
        pending = None  # (losses of the previous step, its step number)
        for chunk in chunks:
            if not first_step_done:
                # first batch + step = splat-plan H2D, prepare_batch compile,
                # and the train-step compile (the dominant cold-cache cost)
                with clock.phase("compile_first_step"):
                    batch, aux = get_device_batch(chunk)
                    state, losses = pipe_for_chunk(chunk).train_step(
                        state, batch, aux)
                    jax.block_until_ready(losses)
                first_step_done = True
            else:
                batch, aux = get_device_batch(chunk)
                state, losses = pipe_for_chunk(chunk).train_step(
                    state, batch, aux)
            host_step += 1
            step_no = host_step
            timer.tick()
            if pending is not None:
                logger.batch_losses("train", _loss_scalars(pending[0]),
                                    pending[1])
            pending = (losses, step_no)
            if (run.checkpoint_every_steps and not multi_style
                    and step_no % run.checkpoint_every_steps == 0):
                from stylemesh_tpu.utils.checkpoint import save_train_state

                save_train_state(state, join(log_dir, "ckpt"))
            if run.log_images_nth > 0 and not multi_style \
                    and step_no % run.log_images_nth == 0:
                _log_image_grid(logger, state, batch, step_no)
        if pending is not None:
            logger.batch_losses("train", _loss_scalars(pending[0]),
                                pending[1])
        # validation
        with clock.phase("validation"):
            for chunk in batched(epoch_indices(val_idx, "sequential"),
                                 run.views_per_batch):
                batch = scene_cache.get_batch(chunk)
                losses = pipe.eval_step(state, batch)
                logger.batch_losses("val", _loss_scalars(losses), host_step)
        tr = logger.epoch_means("train", epoch)
        va = logger.epoch_means("val", epoch)
        print(f"epoch {epoch}: train {tr} val {va} "
              f"({timer.steps_per_sec:.2f} steps/s, "
              f"{timer.steps_per_sec * run.views_per_batch:.2f} views/s)")

        if run.save_texture:
            with clock.phase("texture_export"):
                for s, tex in _export_textures(state):
                    tag = f"epoch_{epoch}" + (f"_style{s}" if s is not None
                                              else "")
                    save_texture_layers(tex, log_dir, tag)
                    save_texture_image(tex, log_dir, tag + "_")
    with clock.phase("texture_export"):
        for s, tex in _export_textures(state):
            name = "texture.npz" if s is None else f"texture_style{s}.npz"
            save_texture_npz(tex, join(log_dir, name))
    logger.close()

    t_total = time.perf_counter() - t_train0
    wall = clock.summary()
    overhead = sum(v["total_s"] for k, v in wall.items()
                   if k in ("compile_first_step", "validation",
                            "texture_export"))
    wall["train_steps"] = {"total_s": round(t_total - overhead, 3),
                           "steps": host_step}
    if specialize and spec_pipes:
        # each signature beyond the base step cost one extra trace+compile
        # inside the step timeline — make that auditable
        wall["level_signatures"] = {
            "specialized": len(spec_pipes),
            "signatures": [
                {"skip": list(s[0]), "stop_grad": list(s[1])}
                for s in spec_pipes
            ]}
    _write_wallclock(log_dir, wall)
    print("wall-clock:", {k: v["total_s"] for k, v in wall.items()
                          if "total_s" in v})
    return state, log_dir, scene_cache


def _loss_scalars(losses):
    """Loss dict -> float scalars. Multi-style losses carry a leading style
    axis: log the style mean under the plain key plus each style's total."""
    out = {}
    for k, v in losses.items():
        arr = np.asarray(v)
        if arr.ndim == 0:
            out[k] = float(arr)
        else:
            out[k] = float(arr.mean())
            if k == "total":
                for s in range(arr.shape[0]):
                    out[f"total_style{s}"] = float(arr[s])
    return out


def _export_textures(state):
    """Yield (style_index | None, Texture) pairs for export — one per style
    for multi-style sweeps, a single (None, texture) otherwise."""
    if hasattr(state, "textures"):  # MultiStyleState
        from stylemesh_tpu.parallel.multistyle import texture_for_style

        for s in range(state.textures.layers[0].shape[0]):
            yield s, texture_for_style(state, s)
    else:
        yield None, state.texture


def _log_image_grid(logger, state, batch, step):
    """The reference's Images/<state> grid (model.py:284-313): pred | photo |
    mask | cos-angle | normalized depth, one row per view."""
    import jax.numpy as jnp

    from stylemesh_tpu.models.texture import sample_texture
    from stylemesh_tpu.ops.color import gatys_post
    from stylemesh_tpu.ops.resize import resize_bilinear

    hw = batch.rgb.shape[1:3]
    # pyramid level matching the content resolution (find_pyramid_size)
    uv = None
    for u in batch.uv:
        if u.shape[1] == hw[0]:
            uv = u
            break
    if uv is None:
        uv = batch.uv[0]
    pred = gatys_post(sample_texture(state.texture, jnp.asarray(uv)))
    pred = resize_bilinear(pred, hw)
    rgb = gatys_post(jnp.asarray(batch.rgb))
    mask3 = np.repeat(np.asarray(batch.mask), 3, axis=-1)
    angle3 = np.repeat(np.asarray(batch.angle_guidance), 3, axis=-1)
    depth3 = np.repeat(np.asarray(batch.depth) / 10.0, 3, axis=-1)
    rows = []
    for v in range(batch.rgb.shape[0]):
        rows.append(np.concatenate([
            np.asarray(pred[v]) * mask3[v], np.asarray(rgb[v]), mask3[v],
            angle3[v], np.clip(depth3[v], 0, 1)], axis=1))
    logger.image("Images/train", np.concatenate(rows, axis=0), step)


def render_styled_frames(texture, scene_cache: SceneCache, out_dir,
                         level=-1):
    """Render every cached view by sampling the trained texture at its baked
    UV map — the post-train render step (the reference shells out to the
    native mipmap renderer here, optimize.py:167-210)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from stylemesh_tpu.models.texture import sample_texture
    from stylemesh_tpu.ops.color import gatys_post

    os.makedirs(out_dir, exist_ok=True)

    from stylemesh_tpu.ops.resize import resize_nearest

    @jax.jit
    def render(texture, uv, mask):
        # mask is at content resolution; resize to uv level resolution
        m = resize_nearest(mask, uv.shape[1:3])
        img = gatys_post(sample_texture(texture, uv))
        return img * m

    # frames render in chunks of 8 (one jit dispatch per chunk, not per
    # frame — the Python-serial per-frame loop dominated post wall-clock)
    paths = []
    b = scene_cache._batch_all
    uv = b.uv[level]
    n = len(scene_cache.indices)
    chunk = 8
    for c0 in range(0, n, chunk):
        sl = slice(c0, min(c0 + chunk, n))
        imgs = np.asarray(render(texture, jnp.asarray(uv[sl]),
                                 jnp.asarray(np.asarray(b.mask[sl]))))
        for o, idx in enumerate(scene_cache.indices[sl]):
            path = join(out_dir, f"{idx}.png")
            Image.fromarray((np.clip(imgs[o], 0, 1) * 255 + 0.5)
                            .astype(np.uint8)).save(path)
            paths.append(path)
    return paths
