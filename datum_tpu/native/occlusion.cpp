// Software occlusion rasterizer.
//
// The reference fills a 256x144 CPU depth buffer with occluder
// triangles every frame (reference: src/renderer/occlusion.cpp
// fill_elements / fill_triangle).  The Python loop version costs tens
// of ms per thousand triangles; this is the same conservative
// constant-depth fill as render/occlusion.py fill_elements, in one
// tight pass.

#include <cmath>
#include <cstdint>

extern "C" {

// clip: (V, 4) clip-space positions; tris: (T, 3); depth: (H, W)
// reverse-Z buffer (0 = far).  Each triangle writes max(depth, zmin)
// over covered pixels, where zmin is its farthest point (conservative).
void datum_occlusion_fill(float* __restrict depth, int32_t width,
                          int32_t height,
                          const float* __restrict clip,
                          const int32_t* __restrict tris, int32_t n_tris) {
  for (int32_t t = 0; t < n_tris; ++t) {
    const int32_t i0 = tris[t * 3 + 0], i1 = tris[t * 3 + 1],
                  i2 = tris[t * 3 + 2];
    const float* v0 = clip + i0 * 4;
    const float* v1 = clip + i1 * 4;
    const float* v2 = clip + i2 * 4;
    const float w0 = v0[3], w1 = v1[3], w2 = v2[3];
    if (w0 <= 1e-4f || w1 <= 1e-4f || w2 <= 1e-4f) continue;

    const float ax = (v0[0] / w0 * 0.5f + 0.5f) * width;
    const float ay = (v0[1] / w0 * 0.5f + 0.5f) * height;
    const float bx = (v1[0] / w1 * 0.5f + 0.5f) * width;
    const float by = (v1[1] / w1 * 0.5f + 0.5f) * height;
    const float cx = (v2[0] / w2 * 0.5f + 0.5f) * width;
    const float cy = (v2[1] / w2 * 0.5f + 0.5f) * height;
    const float z0 = v0[2] / w0, z1 = v1[2] / w1, z2 = v2[2] / w2;
    float zmin = z0 < z1 ? z0 : z1;
    zmin = zmin < z2 ? zmin : z2;
    if (zmin <= 0.0f) continue;

    float xmin = ax < bx ? ax : bx; xmin = xmin < cx ? xmin : cx;
    float xmax = ax > bx ? ax : bx; xmax = xmax > cx ? xmax : cx;
    float ymin = ay < by ? ay : by; ymin = ymin < cy ? ymin : cy;
    float ymax = ay > by ? ay : by; ymax = ymax > cy ? ymax : cy;
    int32_t px0 = (int32_t)std::ceil(xmin); if (px0 < 0) px0 = 0;
    int32_t px1 = (int32_t)std::floor(xmax);
    if (px1 > width - 1) px1 = width - 1;
    int32_t py0 = (int32_t)std::ceil(ymin); if (py0 < 0) py0 = 0;
    int32_t py1 = (int32_t)std::floor(ymax);
    if (py1 > height - 1) py1 = height - 1;
    if (px1 < px0 || py1 < py0) continue;

    const float e0dx = bx - ax, e0dy = by - ay;
    const float e1dx = cx - bx, e1dy = cy - by;
    const float e2dx = ax - cx, e2dy = ay - cy;
    for (int32_t y = py0; y <= py1; ++y) {
      const float yc = y + 0.5f;
      float* row = depth + y * width;
      for (int32_t x = px0; x <= px1; ++x) {
        const float xc = x + 0.5f;
        const float e0 = e0dx * (yc - ay) - e0dy * (xc - ax);
        const float e1 = e1dx * (yc - by) - e1dy * (xc - bx);
        const float e2 = e2dx * (yc - cy) - e2dy * (xc - cx);
        const bool in = (e0 >= 0 && e1 >= 0 && e2 >= 0) ||
                        (e0 <= 0 && e1 <= 0 && e2 <= 0);
        if (in && row[x] < zmin) row[x] = zmin;
      }
    }
  }
}

}  // extern "C"
