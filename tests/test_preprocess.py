"""Preprocessing integration: mesh IO, scene baking, and the baked scene
feeding the data layer + a train step (full pipeline, no real data)."""

import numpy as np
import pytest
from PIL import Image

from stylemesh_tpu.geometry.mesh_io import Mesh, load_mesh, load_ply

pytest_native = pytest.importorskip("stylemesh_tpu.geometry.native")


def _write_ascii_ply_with_face_uvs(path):
    # a quad as 2 triangles with per-face texcoords (Blender export style)
    content = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 2
property list uchar int vertex_indices
property list uchar float texcoord
end_header
-1 -1 3
1 -1 3
1 1 3
-1 1 3
3 0 1 2 6 0 0 1 0 1 1
3 0 2 3 6 0 0 1 1 0 1
"""
    with open(path, "w") as f:
        f.write(content)


def _write_obj(path):
    content = """v -1 -1 3
v 1 -1 3
v 1 1 3
v -1 1 3
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1 2/2 3/3 4/4
"""
    with open(path, "w") as f:
        f.write(content)


def test_load_ply_face_texcoords(tmp_path):
    p = tmp_path / "quad.ply"
    _write_ascii_ply_with_face_uvs(str(p))
    mesh = load_ply(str(p))
    assert mesh.faces.shape == (2, 3)
    assert mesh.uvs is not None and mesh.uvs.shape[0] == mesh.vertices.shape[0]
    assert mesh.normals is not None
    # corner uv of vertex 1 is (1, 0)
    np.testing.assert_allclose(mesh.uvs[1], [1, 0], atol=1e-6)


def test_load_obj_quad(tmp_path):
    p = tmp_path / "quad.obj"
    _write_obj(str(p))
    mesh = load_mesh(str(p))
    assert mesh.faces.shape == (2, 3)  # fan triangulated
    assert mesh.uvs is not None
    np.testing.assert_allclose(mesh.uvs[2], [1, 1], atol=1e-6)


def test_bake_matterport_region_and_train(tmp_path):
    """bake_matterport_region writes the reference's region tree from a
    .house enumeration; discover_matterport_region consumes it and a train
    step runs — the Matterport preprocessing closed loop."""
    import jax.numpy as jnp

    from stylemesh_tpu.data.loading import SceneCache
    from stylemesh_tpu.data.matterport_house import (
        MPHouse,
        MPImage,
        MPPanorama,
        MPRegion,
    )
    from stylemesh_tpu.data.scenes import discover_matterport_regions
    from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
    from stylemesh_tpu.models.vgg import init_vgg_params
    from stylemesh_tpu.preprocess import bake_matterport_region

    h, w = 24, 32
    k = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]], np.float64)
    rng = np.random.default_rng(3)

    images, panos = [], []
    color_src = tmp_path / "matterport_color_images"
    color_src.mkdir()
    for p in range(2):
        pano = MPPanorama(name=f"cam{p:02d}", region_index=0, images=[])
        for yaw in range(2 if p == 0 else 1):
            pose = np.eye(4)
            pose[0, 3] = 0.1 * (p + yaw)  # slight lateral shifts
            img = MPImage(name=f"cam{p:02d}", camera_index=0, yaw_index=yaw,
                          extrinsics=pose, intrinsics=k, width=w, height=h,
                          position=pose[:3, 3], panorama_index=p)
            pano.images.append(img)
            images.append(img)
            Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                            ).save(color_src / img.color_filename)
        panos.append(pano)
    region = MPRegion(label="office", level_index=0, panoramas=panos)
    house = MPHouse(name="17TEST", label=None, regions=[region],
                    panoramas=panos, images=images)

    mesh_path = tmp_path / "region0_uvs_blender.ply"
    _write_ascii_ply_with_face_uvs(str(mesh_path))

    scan = tmp_path / "root" / "17TEST"
    n = bake_matterport_region(house, str(mesh_path), str(scan), 0,
                               color_src=str(color_src),
                               pyramid_heights=(16, 24), verbose=False)
    assert n == 3

    region_dir = scan / "rendered" / "region_0"
    assert (region_dir / "color" / "cam00_i0_0.jpg").exists()
    assert (region_dir / "pose" / "cam00_i0_0.jpg.pose.txt").exists()
    assert (region_dir / "pose" / "cam00_i0_0.jpg.pose.txt.intrinsics.txt").exists()
    assert (region_dir / "angle" / "cam00_i0_0.jpg.angle.npy").exists()
    assert (region_dir / "rendered_depth" /
            "cam00_i0_0.jpg.rendered_depth.npy").exists()
    uv = np.load(region_dir / "uv_-1_24" / "cam01_i0_0.jpg.uvs.npy")
    assert uv.shape == (24, 32, 3)
    assert uv[..., :2].max() <= 1.0 and uv[..., :2].min() >= 0.0

    # idempotent re-run
    assert bake_matterport_region(house, str(mesh_path), str(scan), 0,
                                  pyramid_heights=(16, 24), verbose=False) == 3

    scenes = discover_matterport_regions(str(tmp_path / "root"),
                                         region_index=0,
                                         min_pyramid_height=16)
    assert "17TEST" in scenes
    spec = scenes["17TEST"]
    assert spec.num_frames == 3
    assert spec.rendered_depth and spec.dataset == "matterport"

    cache = SceneCache(spec, resize_size=16)
    batch = cache.get_batch([0, 1])
    assert float(batch.mask.sum()) > 0

    cfg = PipelineConfig(texture_width=32, texture_height=32,
                         hierarchical_layers=1, use_angle_weight=True,
                         use_depth_scaling=False, content_weight=7e1,
                         style_weight=1e-4, style_min_size=16,
                         learning_rate=0.5)
    style = jnp.asarray((rng.random((1, 48, 64, 3), dtype=np.float32) - 0.45) * 255)
    pipe = TexturePipeline(cfg, init_vgg_params(rng=1), style)
    state, losses = pipe.train_step(pipe.init(), batch)
    assert np.isfinite(float(losses["total"]))


def test_bake_scene_and_train(tmp_path):
    """bake_scene writes the reference on-disk contract; the data layer
    consumes it and a train step runs — preprocessing closed-loop."""
    from stylemesh_tpu.data.loading import SceneCache
    from stylemesh_tpu.data.scenes import discover_scannet_scenes
    from stylemesh_tpu.preprocess import bake_scene, render_mipmap_frames

    # scene dir skeleton
    scene = tmp_path / "train" / "images" / "scene0100_00"
    (scene / "color").mkdir(parents=True)
    (scene / "depth").mkdir()
    (scene / "pose").mkdir()

    h, w = 24, 32
    with open(scene / "scene0100_00.txt", "w") as f:
        f.write(f"fx_color = 30.0\nfy_color = 30.0\nmx_color = {w/2}\n"
                f"my_color = {h/2}\ncolorWidth = {w}\ncolorHeight = {h}\n")

    rng = np.random.default_rng(0)
    for i in range(3):
        pose = np.eye(4)
        pose[0, 3] = 0.1 * i
        with open(scene / "pose" / f"{i}.txt", "w") as f:
            for row in pose:
                f.write(" ".join(str(v) for v in row) + "\n")
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            scene / "color" / f"{i}.jpg")

    # mesh: big quad wall at z=3
    mesh_path = tmp_path / "wall_uvs_blender.ply"
    _write_ascii_ply_with_face_uvs(str(mesh_path))

    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = 30.0
    k[0, 2] = w / 2
    k[1, 2] = h / 2

    n = bake_scene(str(mesh_path), str(scene / "pose"), k, (w, h), str(scene),
                   base_hw=(2 * h, 2 * w), pyramid_heights=(16, 24),
                   backend="native", verbose=False)
    assert n == 3
    # contract files exist
    assert (scene / "uv" / "0.npy").exists()
    assert (scene / "uv" / "0.angle.npy").exists()
    assert (scene / "uv" / "0.rendered_depth.npy").exists()
    assert (scene / "uv_16" / "2.npy").exists()
    uv = np.load(scene / "uv_24" / "0.npy")
    assert uv.shape == (24, 32, 3)
    assert uv[..., :2].max() <= 1.0 and uv[..., :2].min() >= 0.0
    # no sensor depth -> rendered depth must carry valid values
    d = np.load(scene / "uv" / "0.rendered_depth.npy")
    assert (d[..., 0] > 0).any()

    # data layer consumes the baked scene (rendered-depth path: delete depth/)
    (scene / "depth").rmdir()
    scenes = discover_scannet_scenes(str(tmp_path / "train" / "images"),
                                     min_pyramid_height=16)
    assert "scene0100_00" in scenes
    spec = scenes["scene0100_00"]
    assert spec.rendered_depth
    cache = SceneCache(spec, resize_size=16)
    batch = cache.get_batch([0, 1])
    assert batch.rgb.shape[0] == 2
    assert float(batch.mask.sum()) > 0

    # one train step on the baked scene
    import jax.numpy as jnp

    from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
    from stylemesh_tpu.models.vgg import init_vgg_params

    cfg = PipelineConfig(texture_width=32, texture_height=32,
                         hierarchical_layers=1, use_angle_weight=True,
                         use_depth_scaling=False, content_weight=7e1,
                         style_weight=1e-4, style_min_size=16,
                         learning_rate=0.5)
    style = jnp.asarray((np.random.default_rng(1).random((1, 48, 64, 3),
                                                         dtype=np.float32) - 0.45) * 255)
    pipe = TexturePipeline(cfg, init_vgg_params(rng=1), style)
    state = pipe.init()
    state, losses = pipe.train_step(state, batch)
    assert np.isfinite(float(losses["total"]))

    # post-train mipmap render
    tex = np.random.default_rng(2).random((32, 32, 3), dtype=np.float32)
    frames = render_mipmap_frames(str(mesh_path), str(scene / "pose"), k,
                                  (w, h), tex, str(tmp_path / "mip"),
                                  hw=(h, w))
    assert len(frames) == 3
    img = np.asarray(Image.open(frames[0]))
    assert img.shape == (h, w, 3)
    assert (img.sum(-1) > 0).any()
