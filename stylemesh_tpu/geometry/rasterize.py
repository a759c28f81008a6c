"""Software UV/angle/depth rasterizer (JAX).

Replaces the reference's C++/OpenGL ``render_uv`` preprocessors
(/root/reference/scripts/scannet/render_uv/ — shaders ``uvmap.frag`` /
``angle.frag`` / ``depth.frag``): given a UV-unwrapped triangle mesh and a
posed pinhole camera it bakes, per pixel,

- the perspective-correct interpolated UV coordinate (background = 0, which
  is what the dataset mask check relies on),
- cos of the viewing angle ``max(dot(n̂_view, dir_to_camera), 0)``,
- the linear eye-space depth.

Design: z-buffered brute force, tiled over faces with a ``lax.scan`` carrying
the per-pixel nearest hit — static shapes, runs on TPU or CPU. Suitable for
test/medium meshes; the high-throughput path for 500k-face scans is the
native C++ rasterizer in ``native/`` (same output contract).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pad_faces(faces, chunk):
    """Pad the face list to a multiple of ``chunk`` with degenerate faces."""
    n = faces.shape[0]
    pad = (-n) % chunk
    if pad:
        faces = np.concatenate([faces, np.zeros((pad, 3), faces.dtype)], axis=0)
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return faces, valid


@functools.partial(jax.jit, static_argnames=("hw", "face_chunk"))
def _rasterize_impl(verts_cam, face_verts, face_valid, uvs_f, normals_f,
                    fx, fy, cx, cy, hw, face_chunk):
    h, w = hw
    eps = 1e-9

    # pixel centers (GL rasterizes at pixel centers x+0.5)
    px = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :].repeat(h, axis=0)
    py = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None].repeat(w, axis=1)
    pix = jnp.stack([px.ravel(), py.ravel()], axis=-1)  # [P, 2]

    n_chunks = face_verts.shape[0] // face_chunk

    def screen(v):
        # camera space -> pixels; +z in front
        z = v[..., 2]
        sx = v[..., 0] / jnp.where(jnp.abs(z) < eps, eps, z) * fx + cx
        sy = v[..., 1] / jnp.where(jnp.abs(z) < eps, eps, z) * fy + cy
        return jnp.stack([sx, sy], axis=-1), z

    n_attr = uvs_f.shape[-1]  # 2 for plain uv; +3 with vertex colors
    init = (
        jnp.full((h * w,), jnp.inf, jnp.float32),  # zbuf
        jnp.zeros((h * w, n_attr), jnp.float32),  # uv (+ extra attributes)
        jnp.zeros((h * w,), jnp.float32),  # cos angle
        jnp.zeros((h * w,), jnp.float32),  # mip lod
    )

    def body(carry, chunk_idx):
        zbuf, uv_out, ang_out, lod_out = carry
        s = chunk_idx * face_chunk
        fv = jax.lax.dynamic_slice_in_dim(face_verts, s, face_chunk, 0)  # [F,3,3]
        fuv = jax.lax.dynamic_slice_in_dim(uvs_f, s, face_chunk, 0)  # [F,3,2]
        fn = jax.lax.dynamic_slice_in_dim(normals_f, s, face_chunk, 0)  # [F,3,3]
        fvalid = jax.lax.dynamic_slice_in_dim(face_valid, s, face_chunk, 0)

        sv, z = screen(fv)  # [F,3,2], [F,3]
        in_front = jnp.all(z > eps, axis=1)  # cull faces behind the camera

        a, b, c = sv[:, 0], sv[:, 1], sv[:, 2]  # [F, 2]

        def edge(p, q, r):
            # signed area of (p,q,r): r is [P,2] broadcast vs [F,1,2]
            return ((q[:, None, 0] - p[:, None, 0]) * (r[None, :, 1] - p[:, None, 1])
                    - (q[:, None, 1] - p[:, None, 1]) * (r[None, :, 0] - p[:, None, 0]))

        w0 = edge(b, c, pix)  # [F, P]
        w1 = edge(c, a, pix)
        w2 = edge(a, b, pix)
        area = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))  # [F]

        inside_pos = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        inside_neg = (w0 <= 0) & (w1 <= 0) & (w2 <= 0)
        inside = jnp.where(area[:, None] >= 0, inside_pos, inside_neg)
        inside &= (jnp.abs(area)[:, None] > eps)
        inside &= (fvalid & in_front)[:, None]

        area_safe = jnp.where(jnp.abs(area) < eps, 1.0, area)
        l0 = w0 / area_safe[:, None]
        l1 = w1 / area_safe[:, None]
        l2 = w2 / area_safe[:, None]

        # perspective-correct interpolation: interpolate attr/z and 1/z
        inv_z = l0 / z[:, 0:1] + l1 / z[:, 1:2] + l2 / z[:, 2:3]  # [F, P]
        z_pix = 1.0 / jnp.where(jnp.abs(inv_z) < eps, eps, inv_z)

        def pinterp(attr):  # attr [F, 3, K] -> [F, P, K]
            acc = (l0[..., None] * attr[:, None, 0] / z[:, None, 0:1]
                   + l1[..., None] * attr[:, None, 1] / z[:, None, 1:2]
                   + l2[..., None] * attr[:, None, 2] / z[:, None, 2:3])
            return acc * z_pix[..., None]

        uv_pix = pinterp(fuv)  # [F, P, n_attr]
        n_pix = pinterp(fn)  # [F, P, 3]
        pos_pix = pinterp(fv)  # [F, P, 3] view-space position

        # angle.frag: cos = max(dot(normalize(n), normalize(-pos)), 0)
        n_hat = n_pix / (jnp.linalg.norm(n_pix, axis=-1, keepdims=True) + eps)
        v_hat = -pos_pix / (jnp.linalg.norm(pos_pix, axis=-1, keepdims=True) + eps)
        cosang = jnp.maximum(jnp.sum(n_hat * v_hat, axis=-1), 0.0)  # [F, P]

        # per-pixel mip LOD (textureQueryLod, uvmap.frag): u = num/den with
        # num = sum_i l_i * u_i/z_i, den = sum_i l_i/z_i; the barycentric l_i
        # are affine in screen space so the num/den gradients are per-face
        # constants and du/dx = (gnum_x - u * gden_x) * z per pixel. Scale
        # matches the GL bake: a 1024^2 texture, clamp to its [0, 10] mips.
        gl_x = jnp.stack([-(c[:, 1] - b[:, 1]), -(a[:, 1] - c[:, 1])], -1)
        gl_y = jnp.stack([c[:, 0] - b[:, 0], a[:, 0] - c[:, 0]], -1)
        gl_x = jnp.concatenate(
            [gl_x, -jnp.sum(gl_x, -1, keepdims=True)], -1) / area_safe[:, None]
        gl_y = jnp.concatenate(
            [gl_y, -jnp.sum(gl_y, -1, keepdims=True)], -1) / area_safe[:, None]
        uv_over_z = fuv[..., :2] / z[..., None]  # [F, 3, 2]
        gnum_x = jnp.einsum("fi,fik->fk", gl_x, uv_over_z)  # [F, 2]
        gnum_y = jnp.einsum("fi,fik->fk", gl_y, uv_over_z)
        gden_x = jnp.sum(gl_x / z, axis=1)  # [F]
        gden_y = jnp.sum(gl_y / z, axis=1)
        duv_dx = (gnum_x[:, None] - uv_pix[..., :2] * gden_x[:, None, None]) \
            * z_pix[..., None] * 1024.0  # [F, P, 2]
        duv_dy = (gnum_y[:, None] - uv_pix[..., :2] * gden_y[:, None, None]) \
            * z_pix[..., None] * 1024.0
        rho2 = jnp.maximum(jnp.sum(duv_dx * duv_dx, -1),
                           jnp.sum(duv_dy * duv_dy, -1))  # [F, P]
        lod = jnp.clip(0.5 * jnp.log2(jnp.maximum(rho2, 1e-20)), 0.0, 10.0)

        z_cand = jnp.where(inside & (z_pix > eps), z_pix, jnp.inf)
        best_f = jnp.argmin(z_cand, axis=0)  # [P]
        best_z = jnp.take_along_axis(z_cand, best_f[None], axis=0)[0]
        best_uv = jnp.take_along_axis(uv_pix, best_f[None, :, None], axis=0)[0]
        best_ang = jnp.take_along_axis(cosang, best_f[None], axis=0)[0]
        best_lod = jnp.take_along_axis(lod, best_f[None], axis=0)[0]

        closer = best_z < zbuf
        zbuf = jnp.where(closer, best_z, zbuf)
        uv_out = jnp.where(closer[:, None], best_uv, uv_out)
        ang_out = jnp.where(closer, best_ang, ang_out)
        lod_out = jnp.where(closer, best_lod, lod_out)
        return (zbuf, uv_out, ang_out, lod_out), None

    (zbuf, uv_out, ang_out, lod_out), _ = jax.lax.scan(
        body, init, jnp.arange(n_chunks))

    hit = jnp.isfinite(zbuf)
    depth = jnp.where(hit, zbuf, 0.0).reshape(h, w)
    uv = jnp.where(hit[:, None], uv_out, 0.0).reshape(h, w, n_attr)
    ang = jnp.where(hit, ang_out, 0.0).reshape(h, w)
    lod = jnp.where(hit, lod_out, 0.0).reshape(h, w)
    return uv, ang, depth, hit.reshape(h, w), lod


def rasterize_mesh(vertices, faces, uvs, normals, cam2world, intrinsics, hw,
                   face_chunk=256):
    """Rasterize one view; returns (uv [H,W,2], cos_angle [H,W],
    depth [H,W], hit_mask [H,W], lod [H,W]).

    Args:
        vertices: ``[Nv, 3]`` world-space positions.
        faces: ``[Nf, 3]`` int vertex indices.
        uvs: ``[Nv, 2]`` texture coordinates in [0, 1].
        normals: ``[Nv, 3]`` vertex normals (world space).
        cam2world: ``[4, 4]`` camera-to-world pose (ScanNet convention).
        intrinsics: ``[3+, 3+]`` pinhole K (fx, fy, cx, cy used).
        hw: output (height, width).
    """
    vertices = np.asarray(vertices, np.float32)
    faces_np = np.asarray(faces, np.int32)
    uvs = np.asarray(uvs, np.float32)
    normals = np.asarray(normals, np.float32)
    cam2world = np.asarray(cam2world, np.float32)
    k = np.asarray(intrinsics, np.float32)

    world2cam = np.linalg.inv(cam2world)
    r, t = world2cam[:3, :3], world2cam[:3, 3]
    verts_cam = vertices @ r.T + t
    normals_cam = normals @ r.T  # rotation only (rigid transform)

    faces_np, valid = _pad_faces(faces_np, face_chunk)
    face_verts = verts_cam[faces_np]  # [Nf, 3, 3]
    uvs_f = uvs[faces_np]
    normals_f = normals_cam[faces_np]

    return _rasterize_impl(
        jnp.asarray(verts_cam), jnp.asarray(face_verts), jnp.asarray(valid),
        jnp.asarray(uvs_f), jnp.asarray(normals_f),
        float(k[0, 0]), float(k[1, 1]), float(k[0, 2]), float(k[1, 2]),
        tuple(hw), face_chunk)


def render_vertex_colors(vertices, faces, colors, normals, cam2world,
                         intrinsics, hw, face_chunk=256, return_depth=False):
    """JAX twin of the reference's vertex_color shader mode
    (scripts/scannet/render_uv/shader/vertex_color.frag, ``mesh_colors``
    flag src/main.cpp:77-78; Matterport color3D.frag): perspective-correct
    interpolated per-vertex colors, fully opaque, no shading — the output
    path for segmentation recoloring / mesh-editing demos.

    ``colors``: ``[Nv, 3]`` in [0, 1]. Returns ``[H, W, 3]`` float
    (background 0), plus the linear eye-depth map when ``return_depth``.
    Colors ride the generalized attribute channels of ``_rasterize_impl``
    (uv slots 2:5)."""
    vertices = np.asarray(vertices, np.float32)
    faces_np = np.asarray(faces, np.int32)
    colors = np.asarray(colors, np.float32)
    normals = np.asarray(normals, np.float32)
    cam2world = np.asarray(cam2world, np.float32)
    k = np.asarray(intrinsics, np.float32)

    world2cam = np.linalg.inv(cam2world)
    r, t = world2cam[:3, :3], world2cam[:3, 3]
    verts_cam = vertices @ r.T + t
    normals_cam = normals @ r.T

    faces_np, valid = _pad_faces(faces_np, face_chunk)
    face_verts = verts_cam[faces_np]
    # uv channels 0:2 are unused dummies; 2:5 carry the vertex colors
    attrs = np.concatenate(
        [np.zeros((len(colors), 2), np.float32), colors], axis=-1)
    attrs_f = attrs[faces_np]
    normals_f = normals_cam[faces_np]

    out, _, depth, hit, _ = _rasterize_impl(
        jnp.asarray(verts_cam), jnp.asarray(face_verts), jnp.asarray(valid),
        jnp.asarray(attrs_f), jnp.asarray(normals_f),
        float(k[0, 0]), float(k[1, 1]), float(k[0, 2]), float(k[1, 2]),
        tuple(hw), face_chunk)
    rgb = jnp.clip(out[..., 2:5], 0.0, 1.0) * hit[..., None]
    return (rgb, depth) if return_depth else rgb
