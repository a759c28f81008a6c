"""The standalone per-stage CLIs (preprocess / texturing / filters) drive
their library functions end to end on tiny fixtures — the runnable-script
surface the reference ships (render_uvs.py, mask_texture.py, ...)."""

import os

import cv2
import numpy as np
import pytest
from PIL import Image

pytest.importorskip("stylemesh_tpu.geometry.native")

from tests.test_preprocess import _write_ascii_ply_with_face_uvs


def _tiny_scene(tmp_path, n=3, h=24, w=32):
    scene = tmp_path / "train" / "images" / "scene0100_00"
    (scene / "color").mkdir(parents=True)
    (scene / "depth").mkdir()
    (scene / "pose").mkdir()
    with open(scene / "scene0100_00.txt", "w") as f:
        f.write(f"fx_color = 30.0\nfy_color = 30.0\nmx_color = {w/2}\n"
                f"my_color = {h/2}\ncolorWidth = {w}\ncolorHeight = {h}\n")
    rng = np.random.default_rng(0)
    for i in range(n):
        pose = np.eye(4)
        pose[0, 3] = 0.1 * i
        with open(scene / "pose" / f"{i}.txt", "w") as f:
            for row in pose:
                f.write(" ".join(str(v) for v in row) + "\n")
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            scene / "color" / f"{i}.jpg")
    mesh_path = tmp_path / "wall_uvs_blender.ply"
    _write_ascii_ply_with_face_uvs(str(mesh_path))
    return scene, mesh_path


def test_preprocess_cli_bake_mipmap_vertex_color(tmp_path):
    from stylemesh_tpu.preprocess import main

    scene, mesh = _tiny_scene(tmp_path)
    main(["bake", "--mesh", str(mesh), "--scene_dir", str(scene),
          "--base_hw", "24", "32", "--pyramid_heights", "16", "24"])
    assert (scene / "uv").is_dir()
    assert (scene / "uv_16").is_dir() and (scene / "uv_24").is_dir()
    assert len(list((scene / "uv_16").glob("*.npy"))) == 3

    tex = tmp_path / "tex.png"
    Image.fromarray(np.full((16, 16, 3), 128, np.uint8)).save(tex)
    main(["mipmap", "--mesh", str(mesh), "--scene_dir", str(scene),
          "--texture", str(tex), "--out", str(tmp_path / "frames"),
          "--hw", "24", "32"])
    assert len(list((tmp_path / "frames").glob("*.png"))) == 3

    colors = tmp_path / "colors.npy"
    from stylemesh_tpu.geometry.mesh_io import load_mesh

    nv = len(load_mesh(str(mesh)).vertices)
    np.save(colors, np.linspace(0, 1, nv * 3).reshape(nv, 3))
    main(["vertex-color", "--mesh", str(mesh), "--scene_dir", str(scene),
          "--colors", str(colors), "--out", str(tmp_path / "vc"),
          "--hw", "24", "32"])
    assert len(list((tmp_path / "vc").glob("*.png"))) == 3


def test_texturing_and_filter_clis(tmp_path):
    from stylemesh_tpu.data.filters import main as filters_main
    from stylemesh_tpu.texturing.mask_image import main as mask_image_main
    from stylemesh_tpu.texturing.video import main as video_main

    scene, mesh = _tiny_scene(tmp_path)

    # styled frames + video assembly
    styled = tmp_path / "styled"
    styled.mkdir()
    for i in range(3):
        img = np.zeros((24, 32, 3), np.uint8)
        cv2.circle(img, (8, 8), 4, (0, 0, 230), -1)
        cv2.imwrite(str(styled / f"{i}.png"), img)
    video_main(["--imgs_dir", str(styled), "--out", str(tmp_path / "v.mp4")])
    assert os.path.getsize(tmp_path / "v.mp4") > 0

    # single-image masking from a uv npy
    uv = np.zeros((24, 32, 4), np.float32)
    uv[4:20, 4:28, 0] = 0.5
    uv[4:20, 4:28, 1] = 0.5
    np.save(tmp_path / "uv0.npy", uv)
    mask_image_main(["--image", str(styled / "0.png"),
                     "--uv", str(tmp_path / "uv0.npy")])
    out = Image.open(styled / "0_masked.png")
    assert out.mode == "RGBA"
    alpha = np.asarray(out)[..., 3]
    assert alpha[10, 10] == 255 and alpha[0, 0] == 0

    # blur filter dry-run never moves files
    filters_main(["--dir", str(scene), "--threshold", "1e9", "--dry_run"])
    assert len(list((scene / "color").glob("*.jpg"))) == 3
