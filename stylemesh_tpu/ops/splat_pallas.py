"""Pallas TPU kernels: tiled texture-gradient splat + windowed gather (v3).

The measured XLA scatter-add costs ~90ns per contribution on TPU (580ms for
one 2x784x1045 pyramid level into a 4096² atlas) and dominated the training
step. These kernels exploit structure:

1. UV maps are smooth within chart islands, so a ``tile_h x tile_w`` pixel
   tile's bilinear footprint fits one ``region_h x region_w`` texel window,
   planned host-side over the per-scene-constant UV maps
   (:mod:`stylemesh_tpu.ops.splat_plan`). Windows are sized per (pyramid
   level, texture layer) from the real footprints — the matmul cost below is
   proportional to window area.
2. Within a window, the 4-corner splat factorizes into row/column one-hot
   weight matrices, so the accumulation becomes MXU matmuls:
   ``region[r, c] += sum_p rowW[r, p] * colW[c, p] * g[ch, p]``.
3. Schedule entries are processed in window-sorted order; a run of entries
   sharing a window loads/stores it once (the planner emits load/store
   flags).
4. Tiles straddling island seams are split into per-island entries: each
   entry filters the tile's pixels by a planned per-pixel label (third uv
   channel) and runs the same factorized path against its own window. Pixel
   sets are disjoint, so every corner is counted exactly once — there is no
   per-corner slow path.
5. Splat entries whose gradient is provably zero (masked out by the angle /
   depth-scaling gradient weights) are dropped from the schedule entirely.
6. Background pixels (grid exactly (-1,-1) -> texel (0,0), weight 1) are
   handled analytically by the wrappers; leftovers outside every entry
   window go to a compact XLA residual scatter.

TPU layout notes: the atlas is processed channel-FIRST ``[3, H, W]`` — a
channel-minor ``[H, W, 3]`` HBM buffer tiles its 3-wide minor dim to 128
lanes (42x padding) and Mosaic rejects 3-wide DMA slices. Window origins are
(8, 128)-aligned (planner guarantees; ``pl.multiple_of`` proves it). Grid
steps run sequentially on the core, so read-modify-write windows never race.
Gather entries of one tile are consecutive, so their shared out block stays
resident in VMEM and later entries accumulate into it (``g_acc``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stylemesh_tpu.ops.splat_plan import PlanArrays


def _corner_terms(u, v, tex_h, tex_w):
    """Shared corner math: indices, weights, aliveness ([1, tile_px] each)."""
    px = jnp.clip((u + 1.0) * 0.5 * (tex_w - 1), 0.0, tex_w - 1)
    py = jnp.clip((v + 1.0) * 0.5 * (tex_h - 1), 0.0, tex_h - 1)
    ix0 = jnp.floor(px).astype(jnp.int32)
    iy0 = jnp.floor(py).astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, tex_w - 1)
    iy1 = jnp.minimum(iy0 + 1, tex_h - 1)
    wx1 = px - ix0.astype(jnp.float32)
    wy1 = py - iy0.astype(jnp.float32)
    # padded pixels (uv sentinel -10) and background pixels (exactly (-1,-1),
    # handled analytically by the wrappers) contribute nothing
    bg = jnp.logical_and(u == -1.0, v == -1.0)
    alive = jnp.logical_and(u > -5.0, jnp.logical_not(bg)).astype(jnp.float32)
    return iy0, iy1, ix0, ix1, wy1, wx1, alive


def _window_onehots(iy0, iy1, ix0, ix1, wy1, wx1, alive, oy, ox,
                    region_h, region_w, tile_px, dtype=jnp.float32):
    """Combined row/col bilinear weight matrices for a window, built as a
    TENT: ``row_w[r, p] = relu(alive[p] - |py_loc[p] - r|)``.

    The tent reproduces ``onehot(iy0-oy)*(1-wy1) + onehot(iy1-oy)*wy1``
    bit-exactly in f32 (``py_loc = (iy0-oy) + wy1`` is exact — both terms
    are small; at the two integer neighbours the tent evaluates to exactly
    ``1-wy1`` / ``wy1`` and everywhere else to <= 0) while replacing two
    int iota-compares + two multiplies + add per matrix with one subtract +
    abs + relu. These [R*, tile_px] builds dominate the kernels' VPU time
    (the round-4 profile's remaining demo-room seam penalty), so the op-count
    halving is the point. Aliveness folds into the tent's peak (alive=0 ->
    relu of a non-positive value -> 0), the clamped bottom/right texel edge
    is exact because its second-corner weight is zero there, and bf16 mode
    casts once from the exact f32 weights — the same single rounding as the
    previous one-hot form. A/B: tools/demo_kernel_ab.py."""
    del iy1, ix1  # tent needs only the fractional positions
    iota_r = jax.lax.broadcasted_iota(
        jnp.int32, (region_h, tile_px), 0).astype(jnp.float32)
    iota_c = jax.lax.broadcasted_iota(
        jnp.int32, (region_w, tile_px), 0).astype(jnp.float32)
    py_loc = (iy0 - oy).astype(jnp.float32) + wy1
    px_loc = (ix0 - ox).astype(jnp.float32) + wx1
    row_w = jnp.maximum(alive - jnp.abs(py_loc - iota_r), 0.0).astype(dtype)
    col_w = jnp.maximum(alive - jnp.abs(px_loc - iota_c), 0.0).astype(dtype)
    return row_w, col_w


def _dot_kw(compute):
    if compute == "bf16":
        return dict(precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
    return dict(precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)


def _cast(x, compute):
    return x.astype(jnp.bfloat16) if compute == "bf16" else x


# --------------------------------------------------------------------- splat


def _dma_coords(oy_ref, ox_ref, row0_ref, j, tex_h_loc, tex_w, eh_dma,
                ew_dma):
    """v4 window addressing: plans carry TRUE (unaligned) origins; the DMA
    reads the aligned-down superset and the kernel rolls the loaded window
    so the true origin lands at (0, 0). Returns (aligned local origin y/x,
    roll amounts dy/dx)."""
    oy_loc = oy_ref[j] - row0_ref[0]
    oy_al = pl.multiple_of(
        jnp.minimum((oy_loc // 8) * 8, tex_h_loc - eh_dma), 8)
    ox_al = pl.multiple_of(
        jnp.minimum((ox_ref[j] // 128) * 128, tex_w - ew_dma), 128)
    return oy_al, ox_al, oy_loc - oy_al, ox_ref[j] - ox_al


def _unroll_window(v, dyr, dxr, eh_dma, ew_dma):
    """Roll a loaded [3, eh_dma, ew_dma] window so (dyr, dxr) moves to the
    origin (roll by size - shift == roll by -shift; indices < the effective
    extents never wrap because eh/ew <= eh_dma - dyr etc.)."""
    v = pltpu.roll(v, eh_dma - dyr, axis=1)
    return pltpu.roll(v, ew_dma - dxr, axis=2)


def _splat_kernel(tex_h, tex_w, tex_h_loc, region_h, region_w, eh_dma,
                  ew_dma, tile_px, compute,
                  ids_ref, oy_ref, ox_ref, sub_ref, load_ref, store_ref,
                  alive_ref, slot_ref, row0_ref,
                  uvl_ref, g_ref, atlas_in_ref, atlas_ref,
                  dma_buf, work, sem_in, sem_out):
    del ids_ref, atlas_in_ref  # ids consumed by index_maps; atlas aliased
    i = pl.program_id(0)
    n = pl.num_programs(0)
    alive = alive_ref[i] != 0
    # window origins are GLOBAL atlas rows (the uv->texel one-hots need
    # them); the DMA subtracts the chip's band offset (0 when unbanded)
    oy = oy_ref[i]
    slot = slot_ref[i]
    do_load = load_ref[i] != 0

    def coords(j):
        return _dma_coords(oy_ref, ox_ref, row0_ref, j, tex_h_loc, tex_w,
                           eh_dma, ew_dma)

    def window_copy(j, s, src_region=False, sem_arr=None):
        oy_al, ox_al, _, _ = coords(j)
        tgt = atlas_ref.at[:, pl.ds(oy_al, eh_dma), pl.ds(ox_al, ew_dma)]
        if src_region:
            return pltpu.make_async_copy(dma_buf.at[s], tgt, sem_arr.at[s])
        return pltpu.make_async_copy(tgt, dma_buf.at[s], sem_arr.at[s])

    # warm-up: the first window run loads its own window
    @pl.when(jnp.logical_and(i == 0, do_load))
    def _():
        window_copy(0, slot, sem_arr=sem_in).start()

    # prefetch the NEXT run's window into the other slot while this entry
    # computes. RMW hazard: if the next DMA window overlaps THIS run's (not
    # yet stored) DMA window, an early prefetch would read stale texels —
    # those prefetch after the store instead (bottom of the kernel). Stores
    # of earlier runs completed inline at their own grid steps, so only the
    # current run needs the disjointness test.
    nxt = jnp.minimum(i + 1, n - 1)
    oy_al_i, ox_al_i, dyr_i, dxr_i = coords(i)
    oy_al_n, ox_al_n, _, _ = coords(nxt)
    # hazard extents: the next LOAD (dma window) vs this run's MODIFIED
    # texels (effective window only — the store also rewrites the dma halo,
    # but with the exact values it loaded, so reading the halo early is
    # benign). oy here is global; oy_al_* are band-local — compare locally.
    oy_loc_i = oy - row0_ref[0]
    disjoint = jnp.logical_or(
        jnp.logical_or(oy_al_n >= oy_loc_i + region_h,
                       oy_loc_i >= oy_al_n + eh_dma),
        jnp.logical_or(ox_al_n >= ox_ref[i] + region_w,
                       ox_ref[i] >= ox_al_n + ew_dma))
    want_prefetch = jnp.logical_and(i + 1 < n, load_ref[nxt] != 0)

    @pl.when(jnp.logical_and(want_prefetch, disjoint))
    def _():
        window_copy(nxt, slot_ref[nxt], sem_arr=sem_in).start()

    uvl = uvl_ref[0]  # [3, tile_px]: u, v, island label
    g = g_ref[0]  # [3, tile_px]
    iy0, iy1, ix0, ix1, wy1, wx1, px_alive = _corner_terms(
        uvl[0:1, :], uvl[1:2, :], tex_h, tex_w)
    # per-island entry: only this entry's pixels contribute
    px_alive = px_alive * (uvl[2:3, :] == sub_ref[i].astype(jnp.float32)
                           ).astype(jnp.float32)
    ox = ox_ref[i]
    dt = jnp.bfloat16 if compute == "bf16" else jnp.float32
    row_w, col_w = _window_onehots(iy0, iy1, ix0, ix1, wy1, wx1, px_alive,
                                   oy, ox, region_h, region_w, tile_px,
                                   dtype=dt)
    gc = _cast(g, compute)

    # deltas accumulate in true-origin coords; the DMA context stays in
    # dma_buf and is only combined at store time
    @pl.when(do_load)
    def _():
        window_copy(i, slot, sem_arr=sem_in).wait()
        work[slot] = jnp.zeros_like(work[slot])

    @pl.when(alive)
    def _():
        kw = _dot_kw(compute)
        # channels stacked into one [3*RH, tile_px] @ [RW, tile_px]^T dot —
        # three separate RH-row matmuls leave most MXU rows idle
        a3 = (row_w[None, :, :] * gc[:, None, :]).reshape(
            3 * region_h, tile_px)
        m = jax.lax.dot_general(
            a3, col_w, dimension_numbers=(((1,), (1,)), ((), ())), **kw)
        work[slot] = work[slot] + m.reshape(3, region_h, region_w)

    @pl.when(store_ref[i] != 0)
    def _():
        z = jnp.pad(work[slot],
                    ((0, 0), (0, eh_dma - region_h), (0, ew_dma - region_w)))
        z = pltpu.roll(z, dyr_i, axis=1)
        z = pltpu.roll(z, dxr_i, axis=2)
        dma_buf[slot] = dma_buf[slot] + z
        cp = window_copy(i, slot, src_region=True, sem_arr=sem_out)
        cp.start()
        cp.wait()

    # overlapping next window: load it only now, after the store landed
    @pl.when(jnp.logical_and(want_prefetch, jnp.logical_not(disjoint)))
    def _():
        window_copy(nxt, slot_ref[nxt], sem_arr=sem_in).start()


# -------------------------------------------------------------------- gather


def _gather_kernel(tex_h, tex_w, tex_h_loc, region_h, region_w, eh_dma,
                   ew_dma, tile_px, compute,
                   ids_ref, oy_ref, ox_ref, sub_ref, load_ref, acc_ref,
                   alive_ref, slot_ref, row0_ref,
                   uvl_ref, atlas_ref, out_ref,
                   dma_buf, work, sem1):
    del ids_ref
    i = pl.program_id(0)
    n = pl.num_programs(0)
    alive = alive_ref[i] != 0
    acc = acc_ref[i] != 0
    # global window rows for the uv->texel math; band-local rows for the DMA
    oy = oy_ref[i]
    ox = ox_ref[i]
    slot = slot_ref[i]
    do_load = jnp.logical_and(alive, load_ref[i] != 0)

    def coords(j):
        return _dma_coords(oy_ref, ox_ref, row0_ref, j, tex_h_loc, tex_w,
                           eh_dma, ew_dma)

    def window_load(j, s):
        oy_al, ox_al, _, _ = coords(j)
        return pltpu.make_async_copy(
            atlas_ref.at[:, pl.ds(oy_al, eh_dma), pl.ds(ox_al, ew_dma)],
            dma_buf.at[s], sem1.at[s])

    @pl.when(jnp.logical_and(i == 0, do_load))
    def _():
        window_load(0, slot).start()

    # double-buffer: start the next run's window while this entry computes
    # (windows are read-only in the gather — no store hazards)
    nxt = jnp.minimum(i + 1, n - 1)
    @pl.when(jnp.logical_and(
        i + 1 < n,
        jnp.logical_and(load_ref[nxt] != 0, alive_ref[nxt] != 0)))
    def _():
        window_load(nxt, slot_ref[nxt]).start()

    # dead tile: zero its out block. (alive=0, acc=1 is schedule padding: the
    # out block belongs to an already-written tile — leave it untouched.)
    @pl.when(jnp.logical_and(jnp.logical_not(alive), jnp.logical_not(acc)))
    def _():
        out_ref[0, :, :] = jnp.zeros((3, tile_px), jnp.float32)

    uvl = uvl_ref[0]
    iy0, iy1, ix0, ix1, wy1, wx1, px_alive = _corner_terms(
        uvl[0:1, :], uvl[1:2, :], tex_h, tex_w)
    px_alive = px_alive * (uvl[2:3, :] == sub_ref[i].astype(jnp.float32)
                           ).astype(jnp.float32)
    dt = jnp.bfloat16 if compute == "bf16" else jnp.float32
    row_w, col_w = _window_onehots(iy0, iy1, ix0, ix1, wy1, wx1, px_alive,
                                   oy, ox, region_h, region_w, tile_px,
                                   dtype=dt)

    # on a load entry: wait the DMA and normalize the window to true-origin
    # coords (one dynamic roll per run)
    @pl.when(do_load)
    def _():
        window_load(i, slot).wait()
        _, _, dyr, dxr = coords(i)
        v = _unroll_window(dma_buf[slot], dyr, dxr, eh_dma, ew_dma)
        work[slot] = v[:, :region_h, :region_w]

    @pl.when(alive)
    def _():
        kw = _dot_kw(compute)
        # pred[ch, p] = sum_r rowW[r,p] * (T[ch] @ colW)[r,p], all channels
        # in one [3*RH, RW] @ [RW, tile_px] dot
        t3 = _cast(work[slot], compute).reshape(3 * region_h, region_w)
        u = jax.lax.dot_general(
            t3, col_w, dimension_numbers=(((1,), (0,)), ((), ())), **kw)
        vals = jnp.sum(u.reshape(3, region_h, tile_px) * row_w[None], axis=1)
        # first entry of a tile writes; later entries of the same tile
        # accumulate (their out block is still resident — entries of one
        # tile are consecutive in the schedule)
        base = jnp.where(acc, out_ref[0], 0.0)
        out_ref[0] = base + vals


# ------------------------------------------------------------------ wrappers


def _tile_batch_cfirst(x, fill, tile_h, tile_w):
    """[V, H, W, C] -> [V*n_tiles, C, tile_px] with constant padding."""
    v, h, w, c = x.shape
    ph = (-h) % tile_h
    pw = (-w) % tile_w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=fill)
    hh, ww = h + ph, w + pw
    x = x.reshape(v, hh // tile_h, tile_h, ww // tile_w, tile_w, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [V, th, tw, C, tile_h, tile_w]
    return x.reshape(-1, c, tile_h * tile_w)


def _uvl_tiles(uv, plan, tile_h, tile_w):
    """uv [V, H, W, 2] + plan labels [V, H, W] -> [V*T, 3, tile_px] input
    (third channel = per-pixel island label; padding gets -10 which never
    matches a sub id)."""
    lbl = jnp.asarray(plan.labels, jnp.float32)[..., None]
    uvl = jnp.concatenate([uv.astype(jnp.float32), lbl], axis=-1)
    return _tile_batch_cfirst(uvl, -10.0, tile_h, tile_w)


def _flat_schedule(plan: PlanArrays, keys, tiles_per_view):
    """Flatten [V, n] schedule arrays; tile ids get per-view offsets so they
    index the flattened [V*T, ...] tile arrays."""
    nv = plan.g_ids.shape[0]
    offs = jnp.arange(nv, dtype=jnp.int32)[:, None] * tiles_per_view
    out = []
    for k in keys:
        a = jnp.asarray(getattr(plan, k))
        if k.endswith("_ids"):
            a = a + offs
        out.append(a.reshape(-1))
    return out


def splat_pallas(g, uv, plan: PlanArrays, tex_h, tex_w, compute="f32",
                 interpret=False, row0=None):
    """Scatter-add 4-corner weighted pixel grads into a zeroed atlas.

    Args:
        g: ``[V, H, W, 3]`` pixel cotangents.
        uv: ``[V, H, W, 2]`` grids in [-1, 1] (x, y).
        plan: :class:`PlanArrays` for (uv, atlas) from the planner.
        tex_h/tex_w: atlas size; must be multiples of (8, 128) for the HBM
            window DMA (use the XLA scatter path otherwise).
        compute: "f32" (exact; fp32 MXU passes) or "bf16" (one-pass MXU,
            fp32 accumulation; ~0.4% weight rounding).
    Returns:
        ``[3, tex_h, tex_w]`` fp32 gradient (without the planner's residual
        and analytic-background contributions — the caller adds those).
    """
    assert tex_h % 8 == 0 and tex_w % 128 == 0, (tex_h, tex_w)
    th, tw, tile_px = plan.tile_h, plan.tile_w, plan.tile_px
    region_h, region_w = plan.region_h, plan.region_w
    tex_h_map = plan.tex_h_global or tex_h  # uv->texel math vs local band
    g_tiles = _tile_batch_cfirst(g.astype(jnp.float32), 0.0, th, tw)
    uvl_tiles = _uvl_tiles(uv, plan, th, tw)
    nv, t_view = plan.g_ids.shape[0], uvl_tiles.shape[0] // uv.shape[0]

    sched = _flat_schedule(
        plan, ("s_ids", "s_oy", "s_ox", "s_sub", "s_load", "s_store",
               "s_alive"), t_view)
    # window-run parity -> double-buffer slot (run r uses region slot r % 2)
    load_flat = sched[4]
    sched.append(jnp.maximum(jnp.cumsum(load_flat) - 1, 0) % 2)
    if row0 is None:
        row0 = jnp.zeros((), jnp.int32)
    sched.append(jnp.reshape(row0, (1,)).astype(jnp.int32))
    n_grid = sched[0].shape[0]
    atlas_zero = jnp.zeros((3, tex_h, tex_w), jnp.float32)

    # v4 DMA superset sizes: aligned-down origin + roll, so the buffer pads
    # one sublane/lane tile beyond the effective window (clamped to the
    # atlas/band extents, which are (8, 128)-multiples)
    eh_dma = min(region_h + 8, tex_h)
    ew_dma = min(-(-region_w // 128) * 128 + 128, tex_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(n_grid,),
        in_specs=[
            pl.BlockSpec((1, 3, tile_px), lambda i, ids, *_: (ids[i], 0, 0)),
            pl.BlockSpec((1, 3, tile_px), lambda i, ids, *_: (ids[i], 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # atlas (aliased out)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 3, eh_dma, ew_dma), jnp.float32),
            pltpu.VMEM((2, 3, region_h, region_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_splat_kernel, tex_h_map, tex_w, tex_h,
                               region_h, region_w, eh_dma, ew_dma, tile_px,
                               compute)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, tex_h, tex_w), jnp.float32),
        input_output_aliases={11: 0},  # atlas input (after 9 prefetch + 2)
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*sched, uvl_tiles, g_tiles, atlas_zero)
    return out


def gather_pallas(texture_cfirst, uv, plan: PlanArrays, out_hw, compute="f32",
                  interpret=False, row0=None):
    """Windowed bilinear gather (forward twin of the splat; same plans).

    Args:
        texture_cfirst: ``[3, tex_h, tex_w]``.
        uv: ``[V, H, W, 2]``; out_hw: (H, W) static.
    Returns:
        ``[V, H, W, 3]`` samples, with contributions only from each tile's
        entry window(s) — the caller overlays the planner's residual corners
        and the analytic background.
    """
    _, tex_h, tex_w = texture_cfirst.shape
    th, tw, tile_px = plan.tile_h, plan.tile_w, plan.tile_px
    region_h, region_w = plan.region_h, plan.region_w
    tex_h_map = plan.tex_h_global or tex_h
    uvl_tiles = _uvl_tiles(uv, plan, th, tw)
    nv = plan.g_ids.shape[0]
    t_view = uvl_tiles.shape[0] // uv.shape[0]

    sched = _flat_schedule(
        plan, ("g_ids", "g_oy", "g_ox", "g_sub", "g_load", "g_acc",
               "g_alive"), t_view)
    # window-run parity -> double-buffer slot
    load_flat = sched[4]
    sched.append(jnp.maximum(jnp.cumsum(load_flat) - 1, 0) % 2)
    if row0 is None:
        row0 = jnp.zeros((), jnp.int32)
    sched.append(jnp.reshape(row0, (1,)).astype(jnp.int32))
    n_grid = sched[0].shape[0]

    eh_dma = min(region_h + 8, tex_h)
    ew_dma = min(-(-region_w // 128) * 128 + 128, tex_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(n_grid,),
        in_specs=[
            pl.BlockSpec((1, 3, tile_px), lambda i, ids, *_: (ids[i], 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # atlas
        ],
        out_specs=pl.BlockSpec((1, 3, tile_px),
                               lambda i, ids, *_: (ids[i], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 3, eh_dma, ew_dma), jnp.float32),
            pltpu.VMEM((2, 3, region_h, region_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_gather_kernel, tex_h_map, tex_w, tex_h,
                               region_h, region_w, eh_dma, ew_dma, tile_px,
                               compute)
    out_tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nv * t_view, 3, tile_px), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*sched, uvl_tiles, texture_cfirst)

    # un-tile back to [V, H, W, 3]
    h, w = out_hw
    hh = -(-h // th) * th
    ww = -(-w // tw) * tw
    x = out_tiles.reshape(nv, hh // th, ww // tw, 3, th, tw)
    x = x.transpose(0, 1, 4, 2, 5, 3).reshape(nv, hh, ww, 3)
    return x[:, :h, :w, :]


def gather_with_residual(texture_cf, uv, plan, compute="f32",
                         interpret=False, include_background=True,
                         row0=None):
    """Full planned forward: windowed gather + residual corners + analytic
    background. Identical values to the plain XLA gather.

    ``texture_cf`` is channel-first ``[3, H, W]`` (the pipeline keeps one
    channel-first copy per step — Mosaic cannot DMA 3-wide minor dims).
    ``include_background=False`` skips the texel-(0,0) overlay (atlas-sharded
    callers apply it once after the cross-band psum).
    """
    v, h, w = uv.shape[:3]
    out = gather_pallas(texture_cf, uv, plan, (h, w), compute=compute,
                        interpret=interpret, row0=row0)
    vals = jnp.take(texture_cf.reshape(3, -1), plan.res_texel.reshape(-1),
                    axis=1).T  # [V*cap, 3]
    vals = vals * plan.res_weight.reshape(-1, 1)
    view_ids = jnp.repeat(jnp.arange(v, dtype=jnp.int32),
                          plan.res_pixel.shape[1])
    flat_idx = view_ids * (h * w) + plan.res_pixel.reshape(-1)
    out_flat = out.reshape(v * h * w, 3).at[flat_idx].add(vals)
    out = out_flat.reshape(v, h, w, 3)
    if not include_background:
        return out
    # analytic background: grid exactly (-1,-1) samples texel (0,0), weight 1
    bg = jnp.logical_and(uv[..., 0] == -1.0, uv[..., 1] == -1.0)[..., None]
    return jnp.where(bg, texture_cf[:, 0, 0][None, None, None, :], out)


def splat_with_residual(g, uv, plan, tex_h, tex_w, compute="f32",
                        interpret=False, include_background=True, row0=None):
    """Full planned backward: window splats + compact residual scatter +
    analytic background sum. Matches the XLA scatter-add backward; returns
    the channel-first ``[3, tex_h, tex_w]`` atlas gradient."""
    atlas = splat_pallas(g, uv, plan, tex_h, tex_w, compute=compute,
                         interpret=interpret, row0=row0)
    v = g.shape[0]
    g_flat = g.reshape(v, -1, 3)
    upd = jnp.take_along_axis(g_flat, plan.res_pixel[..., None], axis=1)
    upd = upd * plan.res_weight[..., None]
    flat = atlas.reshape(3, -1)
    flat = flat.at[:, plan.res_texel.reshape(-1)].add(upd.reshape(-1, 3).T)
    atlas = flat.reshape(3, tex_h, tex_w)
    if not include_background:
        return atlas
    # analytic background: every grid-(-1,-1) pixel adds its cotangent to
    # texel (0,0) with weight 1
    bg = jnp.logical_and(uv[..., 0] == -1.0, uv[..., 1] == -1.0)[..., None]
    bg_sum = jnp.sum(g * bg.astype(g.dtype), axis=(0, 1, 2))
    return atlas.at[:, 0, 0].add(bg_sum)
