"""Native C++ rasterizer parity vs the JAX rasterizer + textured render."""

import numpy as np
import pytest

from stylemesh_tpu.geometry.rasterize import rasterize_mesh

native = pytest.importorskip("stylemesh_tpu.geometry.native")


def _scene():
    rng = np.random.default_rng(3)
    # a little "room": two quads at different depths + a slanted one
    verts, faces, uvs = [], [], []
    quads = [
        ((-1.5, -1.5, 3.0), (1.5, 1.5, 3.0)),  # back wall
        ((-2.0, -0.2, 1.5), (0.2, 2.0, 2.2)),  # slanted panel
    ]
    for qi, ((x0, y0, z0), (x1, y1, z1)) in enumerate(quads):
        base = len(verts)
        verts += [(x0, y0, z0), (x1, y0, (z0 + z1) / 2), (x1, y1, z1), (x0, y1, (z0 + z1) / 2)]
        u0 = 0.5 * qi
        uvs += [(u0, 0), (u0 + 0.4, 0), (u0 + 0.4, 0.9), (u0, 0.9)]
        faces += [(base, base + 1, base + 2), (base, base + 2, base + 3)]
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    uvs = np.asarray(uvs, np.float32)
    # flat normals per quad (approximate; same input to both rasterizers)
    normals = np.tile(np.asarray([0, 0, -1], np.float32), (len(verts), 1))
    cam = np.eye(4, dtype=np.float32)
    cam[0, 3] = 0.1
    k = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1]], np.float32)
    return verts, faces, uvs, normals, cam, k


def test_native_matches_jax_rasterizer():
    verts, faces, uvs, normals, cam, k = _scene()
    hw = (48, 64)
    uv_j, ang_j, d_j, hit_j, lod_j = [
        np.asarray(x) for x in
        rasterize_mesh(verts, faces, uvs, normals, cam, k, hw)]
    uv_n, ang_n, d_n, hit_n, lod_n = native.rasterize_mesh_native(
        verts, faces, uvs, normals, cam, k, hw)

    agree = hit_j == hit_n
    # edge pixels may differ by sub-pixel rounding; demand 99% agreement
    assert agree.mean() > 0.99, agree.mean()
    both = hit_j & hit_n
    assert both.sum() > 500  # scene actually covers a good chunk
    np.testing.assert_allclose(d_n[both], d_j[both], rtol=1e-4)
    np.testing.assert_allclose(uv_n[both], uv_j[both], atol=1e-4)
    np.testing.assert_allclose(ang_n[both], ang_j[both], atol=1e-3)
    np.testing.assert_allclose(lod_n[both], lod_j[both], atol=1e-3)


def test_lod_monotone_with_distance():
    """The baked mip LOD (uv channel 3) must grow as the surface recedes:
    more texels per pixel -> coarser mip (textureQueryLod semantics)."""
    # one quad, uv-mapped 1:1, rendered from two distances
    verts = np.asarray([(-2, -2, 0), (2, -2, 0), (2, 2, 0), (-2, 2, 0)],
                       np.float32)
    faces = np.asarray([(0, 1, 2), (0, 2, 3)], np.int32)
    uvs = np.asarray([(0, 0), (1, 0), (1, 1), (0, 1)], np.float32)
    normals = np.tile(np.asarray([0, 0, -1], np.float32), (4, 1))
    k = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1]], np.float32)

    def lod_at(dist, backend):
        cam = np.eye(4, dtype=np.float32)
        cam[2, 3] = -dist  # camera at z=-dist looking +z at the quad
        if backend == "native":
            _, _, _, hit, lod = native.rasterize_mesh_native(
                verts, faces, uvs, normals, cam, k, (48, 64))
        else:
            out = rasterize_mesh(verts, faces, uvs, normals, cam, k, (48, 64))
            _, _, _, hit, lod = [np.asarray(x) for x in out]
        assert hit.sum() > 100
        return float(np.median(np.asarray(lod)[np.asarray(hit)]))

    for backend in ("native", "jax"):
        near, mid, far = (lod_at(d, backend) for d in (2.0, 4.0, 8.0))
        assert near < mid < far, (backend, near, mid, far)
        # doubling distance doubles texels/pixel -> +1 mip level
        np.testing.assert_allclose(mid - near, 1.0, atol=0.1)
        np.testing.assert_allclose(far - mid, 1.0, atol=0.1)


def test_bake_view_lod_channel():
    """bake_view writes the LOD into uv channel 3 (not a zero placeholder)."""
    from stylemesh_tpu.geometry.mesh_io import Mesh
    from stylemesh_tpu.preprocess import bake_view

    verts, faces, uvs, normals, cam, k = _scene()
    mesh = Mesh(vertices=verts, faces=faces, uvs=uvs, normals=normals)
    uv3, _, _ = bake_view(mesh, cam, k, (48, 64))
    hit = uv3[..., :2].sum(-1) > 0
    assert (uv3[..., 2][hit] > 0).any()
    assert uv3[..., 2].max() <= 10.0


def test_near_plane_clipping():
    """Triangles spanning the camera plane must be clipped, not culled: a
    floor quad passing under the camera still covers the lower frame (the GL
    renderer clips in hardware; a vertex-cull would drop it entirely)."""
    verts = np.asarray([(-5, 1, -5), (5, 1, -5), (5, 1, 5), (-5, 1, 5)],
                       np.float32)  # y=1 'floor' extending behind the camera
    faces = np.asarray([(0, 1, 2), (0, 2, 3)], np.int32)
    uvs = np.asarray([(0, 0), (1, 0), (1, 1), (0, 1)], np.float32)
    normals = np.tile(np.asarray([0, -1, 0], np.float32), (4, 1))
    cam = np.eye(4, dtype=np.float32)  # camera at origin looking +z
    k = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1]], np.float32)
    uv, ang, d, hit, lod = native.rasterize_mesh_native(
        verts, faces, uvs, normals, cam, k, (48, 64))
    # bottom rows see the floor; top rows see nothing
    assert hit[40:].mean() > 0.9
    assert hit[:20].mean() == 0.0
    assert d[hit].min() > 0


def test_native_textured_render():
    verts, faces, uvs, normals, cam, k = _scene()
    tex = np.zeros((64, 64, 3), np.float32)
    tex[:, :, 0] = 1.0  # red texture
    img = native.render_textured_native(verts, faces, uvs, normals, cam, k,
                                        (48, 64), tex, shading=True)
    assert img.shape == (48, 64, 3)
    covered = img.sum(-1) > 0
    assert covered.sum() > 500
    # shading: ambient 0.7 + diffuse, red channel in [0.7, 1]
    reds = img[..., 0][covered]
    assert reds.min() >= 0.69 and reds.max() <= 1.0
    assert (img[..., 1][covered] == 0).all()


def test_vertex_color_render_analytic():
    """Vertex-color mode (reference vertex_color.frag / color3D.frag): a
    single axis-aligned quad with corner colors must interpolate linearly
    in screen space (constant depth => perspective-correct == affine)."""
    verts = np.asarray([(-2, -2, 4), (2, -2, 4), (2, 2, 4), (-2, 2, 4)],
                       np.float32)
    faces = np.asarray([(0, 1, 2), (0, 2, 3)], np.int32)
    colors = np.asarray([(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0)],
                        np.float32)
    normals = np.tile(np.asarray([0, 0, -1], np.float32), (4, 1))
    cam = np.eye(4, dtype=np.float32)
    k = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1]], np.float32)
    rgb, depth = native.render_vertex_colors_native(
        verts, faces, colors, normals, cam, k, (48, 64), return_depth=True)
    assert rgb.shape == (48, 64, 3)
    hit = rgb.sum(-1) > 0
    assert hit.sum() > 1000
    np.testing.assert_allclose(depth[hit], 4.0, rtol=1e-5)
    # near the projected corners, colors approach the vertex colors
    # corner 0 (-2,-2,4) -> screen (40*-2/4+32, 40*-2/4+24) = (12, 4)
    assert rgb[5, 13, 0] > 0.85 and rgb[5, 13, 1] < 0.15
    # corner 2 (2,2,4) -> (52, 44): blue
    assert rgb[43, 51, 2] > 0.85 and rgb[43, 51, 0] < 0.15
    # center (32, 24): average-ish mix, all channels present
    assert (rgb[24, 32] > 0.2).sum() >= 2


def test_vertex_color_native_matches_jax():
    from stylemesh_tpu.geometry.rasterize import render_vertex_colors

    verts, faces, uvs, normals, cam, k = _scene()
    rng = np.random.default_rng(7)
    colors = rng.random((len(verts), 3)).astype(np.float32)
    hw = (48, 64)
    rgb_n = native.render_vertex_colors_native(
        verts, faces, colors, normals, cam, k, hw)
    rgb_j = np.asarray(render_vertex_colors(
        verts, faces, colors, normals, cam, k, hw))
    hit_n = rgb_n.sum(-1) > 0
    hit_j = rgb_j.sum(-1) > 0
    assert (hit_n == hit_j).mean() > 0.99
    both = hit_n & hit_j
    assert both.sum() > 500
    np.testing.assert_allclose(rgb_n[both], rgb_j[both], atol=2e-4)


def test_vertex_color_segmentation_recolor():
    """End-to-end: recolor a mesh per segmentation object id and render it —
    the reference's mesh_colors output path (src/main.cpp:77-78)."""
    from stylemesh_tpu.geometry.mesh_io import Mesh

    verts, faces, uvs, normals, cam, k = _scene()
    # quad 0 (verts 0-3) = object 0 -> red; quad 1 (verts 4-7) = obj 1 -> green
    object_ids = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    palette = np.asarray([(1, 0, 0), (0, 1, 0)], np.float32)
    colors = palette[object_ids]
    rgb = native.render_vertex_colors_native(
        verts, faces, colors, normals, cam, k, (48, 64))
    hit = rgb.sum(-1) > 0
    assert hit.sum() > 500
    # flat per-object colors: every covered pixel is (~1,0,0) or (0,~1,0)
    near = np.minimum(np.abs(rgb[hit]), np.abs(rgb[hit] - 1.0))
    assert near.max() < 1e-5
    assert (rgb[..., 0] > 0.99).any() and (rgb[..., 1] > 0.99).any()


def test_anisotropic_filtering_vs_supersampled_oracle():
    """Anisotropy-8 (the reference's GL_TEXTURE_MAX_ANISOTROPY_EXT=8,
    renderer.cpp:110-140) on a grazing-angle floor: trilinear must pick the
    mip for the LONG footprint axis and wash out stripes that vary along
    the SHORT axis; N-tap aniso keeps them. Oracle = 8x supersampled render
    box-averaged down (the true footprint integral)."""
    # floor y=1, camera at origin looking +z: strongly anisotropic footprints
    verts = np.asarray([(-4, 1, 0.2), (4, 1, 0.2), (4, 1, 30), (-4, 1, 30)],
                       np.float32)
    faces = np.asarray([(0, 1, 2), (0, 2, 3)], np.int32)
    uvs = np.asarray([(0, 0), (1, 0), (1, 1), (0, 1)], np.float32)
    normals = np.tile(np.asarray([0, -1, 0], np.float32), (4, 1))
    cam = np.eye(4, dtype=np.float32)
    k = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1]], np.float32)
    hw = (48, 64)

    # stripes along u (the horizontal/short footprint axis)
    tex = np.zeros((256, 256, 3), np.float32)
    tex[:, :, 0] = (np.arange(256)[None, :] // 8 % 2).astype(np.float32)
    tex[:, :, 1] = 0.5

    def render(max_aniso, scale=1):
        ks = k.copy() * scale
        ks[2, 2] = 1.0
        return native.render_textured_native(
            verts, faces, uvs, normals, cam, ks,
            (hw[0] * scale, hw[1] * scale), tex, shading=False,
            max_aniso=max_aniso)

    s = 8
    oracle = render(1, scale=s).reshape(hw[0], s, hw[1], s, 3).mean((1, 3))
    tri = render(1)
    aniso = render(8)
    hit = oracle.sum(-1) > 0
    mse_tri = float(((tri - oracle) ** 2)[hit].mean())
    mse_aniso = float(((aniso - oracle) ** 2)[hit].mean())
    assert mse_aniso < 0.6 * mse_tri, (mse_aniso, mse_tri)
    # and aniso must not lose coverage or invent color
    assert ((aniso.sum(-1) > 0) == (tri.sum(-1) > 0)).all()
