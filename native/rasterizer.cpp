// stylemesh_tpu native rasterizer
//
// CPU replacement for the reference's C++/OpenGL render_uv preprocessors
// (reference: scripts/{scannet,matterport}/render_uv — GLFW/GLEW renderer with
// uvmap/angle/depth fragment shaders). Produces the same per-view outputs
// without any GL context:
//   - uv map      [H, W, 2]  perspective-correct interpolated texture coords
//                            (background 0 — the dataset's mask contract)
//   - angle map   [H, W]     max(dot(normal_view, dir_to_camera), 0)
//   - depth map   [H, W]     linear eye-space depth (background 0)
//   - rgb render  [H, W, 3]  textured render with trilinear mipmapping +
//                            the reference rgb.frag's ambient/diffuse shading
//                            (the post-train "mipmap renderer" equivalent)
//
// Z-buffered barycentric rasterization over face bounding boxes: O(covered
// pixels), handles 500k-face scans in milliseconds-to-seconds per view.
// Exposed as a C ABI for ctypes (no pybind11 in this toolchain).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libstylemesh_native.so rasterizer.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 normalize(V3 a) {
  float n = std::sqrt(dot(a, a));
  if (n < 1e-20f) return {0, 0, 0};
  return {a.x / n, a.y / n, a.z / n};
}

// world -> camera transform from a cam2world pose (row-major 4x4).
struct Camera {
  float r[9];  // world2cam rotation
  float t[3];  // world2cam translation
  float fx, fy, cx, cy;

  V3 to_cam(const float* p) const {
    return {
        r[0] * p[0] + r[1] * p[1] + r[2] * p[2] + t[0],
        r[3] * p[0] + r[4] * p[1] + r[5] * p[2] + t[1],
        r[6] * p[0] + r[7] * p[1] + r[8] * p[2] + t[2],
    };
  }
  V3 rot(const float* n) const {
    return {
        r[0] * n[0] + r[1] * n[1] + r[2] * n[2],
        r[3] * n[0] + r[4] * n[1] + r[5] * n[2],
        r[6] * n[0] + r[7] * n[1] + r[8] * n[2],
    };
  }
};

Camera make_camera(const float* cam2world, float fx, float fy, float cx, float cy) {
  // invert a rigid transform: R' = R^T, t' = -R^T t
  Camera c;
  const float* m = cam2world;
  float R[9] = {m[0], m[1], m[2], m[4], m[5], m[6], m[8], m[9], m[10]};
  float T[3] = {m[3], m[7], m[11]};
  c.r[0] = R[0]; c.r[1] = R[3]; c.r[2] = R[6];
  c.r[3] = R[1]; c.r[4] = R[4]; c.r[5] = R[7];
  c.r[6] = R[2]; c.r[7] = R[5]; c.r[8] = R[8];
  c.t[0] = -(c.r[0] * T[0] + c.r[1] * T[1] + c.r[2] * T[2]);
  c.t[1] = -(c.r[3] * T[0] + c.r[4] * T[1] + c.r[5] * T[2]);
  c.t[2] = -(c.r[6] * T[0] + c.r[7] * T[1] + c.r[8] * T[2]);
  c.fx = fx; c.fy = fy; c.cx = cx; c.cy = cy;
  return c;
}

struct Framebuffer {
  int h, w;
  std::vector<float> zbuf;     // +inf = empty
  std::vector<float> uv;      // [h*w*2]
  std::vector<float> angle;   // [h*w]
  std::vector<int32_t> face;  // face id per pixel (-1 = none)
  std::vector<float> lod;     // mip lod per pixel
  std::vector<float> attr3;   // optional interpolated vec3 (vertex colors)
  std::vector<float> deriv;   // optional [h*w*4] texel-space uv derivatives
                              // (dudx, dvdx, dudy, dvdy) for aniso sampling

  Framebuffer(int hh, int ww, bool with_attr3 = false,
              bool with_deriv = false) : h(hh), w(ww) {
    zbuf.assign((size_t)h * w, INFINITY);
    uv.assign((size_t)h * w * 2, 0.f);
    angle.assign((size_t)h * w, 0.f);
    face.assign((size_t)h * w, -1);
    lod.assign((size_t)h * w, 0.f);
    if (with_attr3) attr3.assign((size_t)h * w * 3, 0.f);
    if (with_deriv) deriv.assign((size_t)h * w * 4, 0.f);
  }
};

// Rasterize one fully-in-front triangle with perspective-correct
// interpolation (callers clip against the near plane first).
void raster_face(Framebuffer& fb, const Camera& cam, int face_id,
                 const V3 pc[3], const float uvc[3][2], const V3 nc[3],
                 float tex_w, float tex_h, const V3* cc = nullptr) {
  const float eps = 1e-9f;
  if (pc[0].z <= eps || pc[1].z <= eps || pc[2].z <= eps) return;

  float sx[3], sy[3];
  for (int i = 0; i < 3; i++) {
    sx[i] = pc[i].x / pc[i].z * cam.fx + cam.cx;
    sy[i] = pc[i].y / pc[i].z * cam.fy + cam.cy;
  }
  float area = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sy[1] - sy[0]) * (sx[2] - sx[0]);
  if (std::fabs(area) < eps) return;

  int x0 = std::max(0, (int)std::floor(std::min({sx[0], sx[1], sx[2]}) - 0.5f));
  int x1 = std::min(fb.w - 1, (int)std::ceil(std::max({sx[0], sx[1], sx[2]}) + 0.5f));
  int y0 = std::max(0, (int)std::floor(std::min({sy[0], sy[1], sy[2]}) - 0.5f));
  int y1 = std::min(fb.h - 1, (int)std::ceil(std::max({sy[0], sy[1], sy[2]}) + 0.5f));
  if (x0 > x1 || y0 > y1) return;

  float inv_area = 1.0f / area;
  float inv_z[3] = {1.f / pc[0].z, 1.f / pc[1].z, 1.f / pc[2].z};

  // per-pixel mip LOD via exact perspective-correct screen derivatives
  // (textureQueryLod semantics, uvmap.frag): u(x,y) = num_u/den with
  // num_u = sum_i w_i(x,y) * u_i/z_i and den = sum_i w_i/z_i, where the
  // barycentric w_i are affine in screen space — so num/den gradients are
  // per-face constants and du/dx = (gnum_x - u * gden_x) * z per pixel.
  float g_x[3] = {-(sy[2] - sy[1]) * inv_area, -(sy[0] - sy[2]) * inv_area, 0.f};
  float g_y[3] = {(sx[2] - sx[1]) * inv_area, (sx[0] - sx[2]) * inv_area, 0.f};
  g_x[2] = -g_x[0] - g_x[1];
  g_y[2] = -g_y[0] - g_y[1];
  float gnum_ux = 0.f, gnum_uy = 0.f, gnum_vx = 0.f, gnum_vy = 0.f;
  float gden_x = 0.f, gden_y = 0.f;
  for (int i = 0; i < 3; i++) {
    gnum_ux += g_x[i] * uvc[i][0] * inv_z[i];
    gnum_uy += g_y[i] * uvc[i][0] * inv_z[i];
    gnum_vx += g_x[i] * uvc[i][1] * inv_z[i];
    gnum_vy += g_y[i] * uvc[i][1] * inv_z[i];
    gden_x += g_x[i] * inv_z[i];
    gden_y += g_y[i] * inv_z[i];
  }

  for (int py = y0; py <= y1; py++) {
    for (int px = x0; px <= x1; px++) {
      float fx = px + 0.5f, fy = py + 0.5f;
      float w0 = ((sx[2] - sx[1]) * (fy - sy[1]) - (sy[2] - sy[1]) * (fx - sx[1])) * inv_area;
      float w1 = ((sx[0] - sx[2]) * (fy - sy[2]) - (sy[0] - sy[2]) * (fx - sx[2])) * inv_area;
      float w2 = 1.0f - w0 - w1;
      if (w0 < 0 || w1 < 0 || w2 < 0) continue;
      float izp = w0 * inv_z[0] + w1 * inv_z[1] + w2 * inv_z[2];
      if (izp < eps) continue;
      float z = 1.0f / izp;
      size_t idx = (size_t)py * fb.w + px;
      if (z >= fb.zbuf[idx]) continue;

      float l0 = w0 * inv_z[0] * z, l1 = w1 * inv_z[1] * z, l2 = w2 * inv_z[2] * z;
      float u = l0 * uvc[0][0] + l1 * uvc[1][0] + l2 * uvc[2][0];
      float v = l0 * uvc[0][1] + l1 * uvc[1][1] + l2 * uvc[2][1];
      V3 n = {l0 * nc[0].x + l1 * nc[1].x + l2 * nc[2].x,
              l0 * nc[0].y + l1 * nc[1].y + l2 * nc[2].y,
              l0 * nc[0].z + l1 * nc[1].z + l2 * nc[2].z};
      V3 pos = {l0 * pc[0].x + l1 * pc[1].x + l2 * pc[2].x,
                l0 * pc[0].y + l1 * pc[1].y + l2 * pc[2].y,
                l0 * pc[0].z + l1 * pc[1].z + l2 * pc[2].z};
      V3 nh = normalize(n);
      V3 view = normalize({-pos.x, -pos.y, -pos.z});
      float cosang = std::max(dot(nh, view), 0.0f);

      float dudx = (gnum_ux - u * gden_x) * z * tex_w;
      float dudy = (gnum_uy - u * gden_y) * z * tex_w;
      float dvdx = (gnum_vx - v * gden_x) * z * tex_h;
      float dvdy = (gnum_vy - v * gden_y) * z * tex_h;
      float rho2 = std::max(dudx * dudx + dvdx * dvdx,
                            dudy * dudy + dvdy * dvdy);
      fb.zbuf[idx] = z;
      fb.uv[idx * 2 + 0] = u;
      fb.uv[idx * 2 + 1] = v;
      fb.angle[idx] = cosang;
      fb.face[idx] = face_id;
      fb.lod[idx] = 0.5f * std::log2(std::max(rho2, 1e-20f));
      if (!fb.deriv.empty()) {
        fb.deriv[idx * 4 + 0] = dudx;
        fb.deriv[idx * 4 + 1] = dvdx;
        fb.deriv[idx * 4 + 2] = dudy;
        fb.deriv[idx * 4 + 3] = dvdy;
      }
      if (cc) {
        fb.attr3[idx * 3 + 0] = l0 * cc[0].x + l1 * cc[1].x + l2 * cc[2].x;
        fb.attr3[idx * 3 + 1] = l0 * cc[0].y + l1 * cc[1].y + l2 * cc[2].y;
        fb.attr3[idx * 3 + 2] = l0 * cc[0].z + l1 * cc[1].z + l2 * cc[2].z;
      }
    }
  }
}

// Sutherland-Hodgman clip of one triangle against the near plane z = znear
// (the GL renderer clips in hardware; indoor meshes have wall triangles that
// span the camera plane, which a vertex-cull would drop entirely). The
// clipped polygon (up to 4 vertices) is fan-triangulated into raster_face.
struct ClipVert {
  V3 p;
  float u, v;
  V3 n;
  V3 c;  // optional vertex color (vertex_color.frag / color3D.frag)
};

static inline ClipVert lerp_cv(const ClipVert& a, const ClipVert& b, float t) {
  ClipVert o;
  o.p = {a.p.x + (b.p.x - a.p.x) * t, a.p.y + (b.p.y - a.p.y) * t,
         a.p.z + (b.p.z - a.p.z) * t};
  o.u = a.u + (b.u - a.u) * t;
  o.v = a.v + (b.v - a.v) * t;
  o.n = {a.n.x + (b.n.x - a.n.x) * t, a.n.y + (b.n.y - a.n.y) * t,
         a.n.z + (b.n.z - a.n.z) * t};
  o.c = {a.c.x + (b.c.x - a.c.x) * t, a.c.y + (b.c.y - a.c.y) * t,
         a.c.z + (b.c.z - a.c.z) * t};
  return o;
}

void clip_and_raster(Framebuffer& fb, const Camera& cam, int face_id,
                     const V3 pc[3], const float uvc[3][2], const V3 nc[3],
                     float tex_w, float tex_h, const V3* cc = nullptr,
                     float znear = 0.01f) {
  V3 zero = {0, 0, 0};
  ClipVert in[3] = {{pc[0], uvc[0][0], uvc[0][1], nc[0], cc ? cc[0] : zero},
                    {pc[1], uvc[1][0], uvc[1][1], nc[1], cc ? cc[1] : zero},
                    {pc[2], uvc[2][0], uvc[2][1], nc[2], cc ? cc[2] : zero}};
  ClipVert out[4];
  int n_out = 0;
  for (int i = 0; i < 3; i++) {
    const ClipVert& a = in[i];
    const ClipVert& b = in[(i + 1) % 3];
    bool a_in = a.p.z >= znear, b_in = b.p.z >= znear;
    if (a_in) out[n_out++] = a;
    if (a_in != b_in) {
      float t = (znear - a.p.z) / (b.p.z - a.p.z);
      out[n_out++] = lerp_cv(a, b, t);
    }
  }
  for (int k = 2; k < n_out; k++) {
    V3 tp[3] = {out[0].p, out[k - 1].p, out[k].p};
    float tuv[3][2] = {{out[0].u, out[0].v},
                       {out[k - 1].u, out[k - 1].v},
                       {out[k].u, out[k].v}};
    V3 tn[3] = {out[0].n, out[k - 1].n, out[k].n};
    V3 tc[3] = {out[0].c, out[k - 1].c, out[k].c};
    raster_face(fb, cam, face_id, tp, tuv, tn, tex_w, tex_h,
                cc ? tc : nullptr);
  }
}

}  // namespace

extern "C" {

// Rasterize one view. All matrices row-major float32.
//  vertices [n_verts*3], faces [n_faces*3] int32, uvs [n_verts*2],
//  normals [n_verts*3], cam2world [16], out_uv [h*w*2], out_angle [h*w],
//  out_depth [h*w], out_lod [h*w] (nullable). Returns covered pixel count.
//
// out_lod replicates uvmap.frag's third channel: textureQueryLod against a
// 1024^2 texture (the GL renderer's default texture at bake time,
// renderer.cpp:120), clamped to its mip range [0, 10].
int64_t sm_rasterize(const float* vertices, int64_t n_verts,
                     const int32_t* faces, int64_t n_faces,
                     const float* uvs, const float* normals,
                     const float* cam2world,
                     float fx, float fy, float cx, float cy,
                     int32_t h, int32_t w,
                     float* out_uv, float* out_angle, float* out_depth,
                     float* out_lod) {
  (void)n_verts;
  Camera cam = make_camera(cam2world, fx, fy, cx, cy);
  Framebuffer fb(h, w);

  for (int64_t f = 0; f < n_faces; f++) {
    const int32_t* idx = faces + f * 3;
    V3 pc[3];
    float uvc[3][2];
    V3 nc[3];
    for (int k = 0; k < 3; k++) {
      const float* p = vertices + (size_t)idx[k] * 3;
      pc[k] = cam.to_cam(p);
      uvc[k][0] = uvs[(size_t)idx[k] * 2 + 0];
      uvc[k][1] = uvs[(size_t)idx[k] * 2 + 1];
      const float* n = normals + (size_t)idx[k] * 3;
      nc[k] = cam.rot(n);
    }
    clip_and_raster(fb, cam, (int)f, pc, uvc, nc, 1024.f, 1024.f);
  }

  int64_t covered = 0;
  for (int64_t i = 0; i < (int64_t)h * w; i++) {
    bool hit = std::isfinite(fb.zbuf[i]) && fb.face[i] >= 0;
    out_depth[i] = hit ? fb.zbuf[i] : 0.f;
    out_uv[i * 2 + 0] = hit ? fb.uv[i * 2 + 0] : 0.f;
    out_uv[i * 2 + 1] = hit ? fb.uv[i * 2 + 1] : 0.f;
    out_angle[i] = hit ? fb.angle[i] : 0.f;
    if (out_lod)
      out_lod[i] = hit ? std::min(std::max(fb.lod[i], 0.f), 10.f) : 0.f;
    covered += hit;
  }
  return covered;
}

// Textured forward render with trilinear mipmapping + the reference
// rgb.frag shading (ambient 0.7 + diffuse 0.3 * cos angle).
//  texture: mip chain packed as level pointers? — single base level here;
//  mips are generated internally (box filter), matching GL's
//  glGenerateMipmap + LINEAR_MIPMAP_LINEAR sampling.
//  max_aniso: anisotropic filtering degree (the reference sets
//  GL_TEXTURE_MAX_ANISOTROPY_EXT = 8, renderer.cpp:110-140). 1 = isotropic
//  trilinear; N > 1 takes up to N trilinear taps spaced along the major
//  screen-space uv-derivative axis at the minor-axis mip level — the
//  standard footprint-assembly scheme GL hardware implements.
int64_t sm_render_textured(const float* vertices, int64_t n_verts,
                           const int32_t* faces, int64_t n_faces,
                           const float* uvs, const float* normals,
                           const float* cam2world,
                           float fx, float fy, float cx, float cy,
                           int32_t h, int32_t w,
                           const float* texture, int32_t tex_h, int32_t tex_w,
                           int32_t shading,  // 0 = unlit, 1 = ambient+diffuse
                           int32_t max_aniso,
                           float* out_rgb) {
  (void)n_verts;
  Camera cam = make_camera(cam2world, fx, fy, cx, cy);
  Framebuffer fb(h, w, /*with_attr3=*/false, /*with_deriv=*/max_aniso > 1);

  // store uv + angle + lod; shade afterwards
  for (int64_t f = 0; f < n_faces; f++) {
    const int32_t* idx = faces + f * 3;
    V3 pc[3];
    float uvc[3][2];
    V3 nc[3];
    for (int k = 0; k < 3; k++) {
      const float* p = vertices + (size_t)idx[k] * 3;
      pc[k] = cam.to_cam(p);
      uvc[k][0] = uvs[(size_t)idx[k] * 2 + 0];
      uvc[k][1] = uvs[(size_t)idx[k] * 2 + 1];
      const float* n = normals + (size_t)idx[k] * 3;
      nc[k] = cam.rot(n);
    }
    clip_and_raster(fb, cam, (int)f, pc, uvc, nc, (float)tex_w, (float)tex_h);
  }

  // build mip chain (box filter)
  std::vector<std::vector<float>> mips;
  std::vector<int> mw, mh;
  mips.emplace_back(texture, texture + (size_t)tex_h * tex_w * 3);
  mw.push_back(tex_w);
  mh.push_back(tex_h);
  while (mw.back() > 1 || mh.back() > 1) {
    int pw = mw.back(), ph = mh.back();
    int nw2 = std::max(1, pw / 2), nh2 = std::max(1, ph / 2);
    std::vector<float> next((size_t)nw2 * nh2 * 3);
    const std::vector<float>& prev = mips.back();
    for (int y = 0; y < nh2; y++) {
      for (int x = 0; x < nw2; x++) {
        for (int c = 0; c < 3; c++) {
          int x0 = std::min(2 * x, pw - 1), x1 = std::min(2 * x + 1, pw - 1);
          int y0 = std::min(2 * y, ph - 1), y1 = std::min(2 * y + 1, ph - 1);
          float s = prev[((size_t)y0 * pw + x0) * 3 + c] + prev[((size_t)y0 * pw + x1) * 3 + c]
                  + prev[((size_t)y1 * pw + x0) * 3 + c] + prev[((size_t)y1 * pw + x1) * 3 + c];
          next[((size_t)y * nw2 + x) * 3 + c] = s * 0.25f;
        }
      }
    }
    mips.push_back(std::move(next));
    mw.push_back(nw2);
    mh.push_back(nh2);
  }

  auto sample_level = [&](int level, float u, float v, float* rgb) {
    level = std::max(0, std::min(level, (int)mips.size() - 1));
    int tw = mw[level], th = mh[level];
    // align_corners=true bilinear with border clamp (texture.py:46-54)
    float px = std::min(std::max(u * (tw - 1), 0.f), (float)(tw - 1));
    float py = std::min(std::max(v * (th - 1), 0.f), (float)(th - 1));
    int x0 = (int)px, y0 = (int)py;
    int x1 = std::min(x0 + 1, tw - 1), y1 = std::min(y0 + 1, th - 1);
    float ax = px - x0, ay = py - y0;
    const std::vector<float>& m = mips[level];
    for (int c = 0; c < 3; c++) {
      float v00 = m[((size_t)y0 * tw + x0) * 3 + c];
      float v01 = m[((size_t)y0 * tw + x1) * 3 + c];
      float v10 = m[((size_t)y1 * tw + x0) * 3 + c];
      float v11 = m[((size_t)y1 * tw + x1) * 3 + c];
      rgb[c] = (v00 * (1 - ax) + v01 * ax) * (1 - ay) + (v10 * (1 - ax) + v11 * ax) * ay;
    }
  };

  int64_t covered = 0;
  for (int64_t i = 0; i < (int64_t)h * w; i++) {
    bool hit = std::isfinite(fb.zbuf[i]) && fb.face[i] >= 0;
    if (!hit) {
      out_rgb[i * 3] = out_rgb[i * 3 + 1] = out_rgb[i * 3 + 2] = 0.f;
      continue;
    }
    covered++;
    float u = fb.uv[i * 2], v = fb.uv[i * 2 + 1];

    // footprint: X/Y screen-derivative vectors in texel units
    int taps = 1;
    float step_u = 0.f, step_v = 0.f;  // tap spacing in uv units
    float lodf = std::max(0.f, fb.lod[i]);
    if (max_aniso > 1) {
      float dudx = fb.deriv[i * 4 + 0], dvdx = fb.deriv[i * 4 + 1];
      float dudy = fb.deriv[i * 4 + 2], dvdy = fb.deriv[i * 4 + 3];
      float px2 = dudx * dudx + dvdx * dvdx;
      float py2 = dudy * dudy + dvdy * dvdy;
      float pmax2 = std::max(px2, py2), pmin2 = std::min(px2, py2);
      float pmax = std::sqrt(std::max(pmax2, 1e-20f));
      float pmin = std::sqrt(std::max(pmin2, 1e-20f));
      float ratio = std::min(pmax / pmin, (float)max_aniso);
      taps = std::max(1, (int)std::ceil(ratio - 1e-3f));
      // sample at the minor-axis mip level, walking the major axis
      lodf = std::max(0.f, std::log2(std::max(pmax / ratio, 1e-20f)));
      bool x_major = px2 >= py2;
      float mu = x_major ? dudx : dudy, mv = x_major ? dvdx : dvdy;
      step_u = mu / tex_w / taps;  // back to uv units
      step_v = mv / tex_h / taps;
    }
    int l0 = (int)lodf;
    float frac = lodf - l0;
    float acc[3] = {0.f, 0.f, 0.f};
    for (int t = 0; t < taps; t++) {
      float off = taps > 1 ? (t + 0.5f) - 0.5f * taps : 0.f;
      float tu = u + step_u * off, tv = v + step_v * off;
      float rgb0[3], rgb1[3];
      sample_level(l0, tu, tv, rgb0);
      sample_level(l0 + 1, tu, tv, rgb1);
      for (int c = 0; c < 3; c++)
        acc[c] += rgb0[c] * (1 - frac) + rgb1[c] * frac;
    }
    float shade = shading ? (0.7f + 0.3f * fb.angle[i]) : 1.0f;
    for (int c = 0; c < 3; c++) {
      float val = acc[c] / taps * shade;
      out_rgb[i * 3 + c] = std::min(std::max(val, 0.f), 1.f);
    }
  }
  return covered;
}

// Per-vertex-color render — the reference's vertex_color shader mode
// (scripts/scannet/render_uv/shader/vertex_color.frag, mesh_colors flag
// src/main.cpp:77-78; Matterport color3D.frag): draws interpolated vertex
// colors fully opaque, no shading. This is the output path of the
// segmentation-recoloring and mesh-editing demos (segmentation_provider /
// mesh_transformer). colors [n_verts*3] in [0,1]; out_rgb [h*w*3]
// (background 0); out_depth [h*w] nullable (linear eye depth, as the
// commented color3D.frag depth branch). Returns covered pixel count.
int64_t sm_render_vertex_colors(const float* vertices, int64_t n_verts,
                                const int32_t* faces, int64_t n_faces,
                                const float* colors, const float* normals,
                                const float* cam2world,
                                float fx, float fy, float cx, float cy,
                                int32_t h, int32_t w,
                                float* out_rgb, float* out_depth) {
  (void)n_verts;
  Camera cam = make_camera(cam2world, fx, fy, cx, cy);
  Framebuffer fb(h, w, /*with_attr3=*/true);

  float zero2[3][2] = {{0, 0}, {0, 0}, {0, 0}};
  for (int64_t f = 0; f < n_faces; f++) {
    const int32_t* idx = faces + f * 3;
    V3 pc[3], nc[3], cc[3];
    for (int k = 0; k < 3; k++) {
      const float* p = vertices + (size_t)idx[k] * 3;
      pc[k] = cam.to_cam(p);
      const float* n = normals + (size_t)idx[k] * 3;
      nc[k] = cam.rot(n);
      const float* c = colors + (size_t)idx[k] * 3;
      cc[k] = {c[0], c[1], c[2]};
    }
    clip_and_raster(fb, cam, (int)f, pc, zero2, nc, 1.f, 1.f, cc);
  }

  int64_t covered = 0;
  for (int64_t i = 0; i < (int64_t)h * w; i++) {
    bool hit = std::isfinite(fb.zbuf[i]) && fb.face[i] >= 0;
    for (int c = 0; c < 3; c++)
      out_rgb[i * 3 + c] =
          hit ? std::min(std::max(fb.attr3[i * 3 + c], 0.f), 1.f) : 0.f;
    if (out_depth) out_depth[i] = hit ? fb.zbuf[i] : 0.f;
    covered += hit;
  }
  return covered;
}

}  // extern "C"
