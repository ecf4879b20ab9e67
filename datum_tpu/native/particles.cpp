// Particle integration hot loop.
//
// The reference simulates particles on the CPU across worker threads
// (reference: src/renderer/particlesystem.cpp update; examples/stardust
// runs 120k particles).  The numpy path does several fancy-indexed
// read-modify-write passes; this single fused SoA pass is what the
// compiler auto-vectorizes, called via ctypes from
// render/particlesystem.py.

#include <cstdint>
#include <cstring>

extern "C" {

// Integrate velocity/position, decay life, clear alive on expiry,
// and write t01 = 1 - life/maxlife for the over-life module lookups.
// All arrays are dense SoA of length n; alive is a uint8 mask.
void datum_particles_integrate(float* __restrict pos,      // (n, 3)
                               float* __restrict vel,      // (n, 3)
                               float* __restrict life,     // (n,)
                               const float* __restrict maxlife,  // (n,)
                               uint8_t* __restrict alive,  // (n,)
                               float* __restrict t01,      // (n,)
                               int32_t n,
                               const float* __restrict acc,  // (3,)
                               float dt) {
  const float ax = acc[0] * dt, ay = acc[1] * dt, az = acc[2] * dt;
  for (int32_t i = 0; i < n; ++i) {
    const float m = alive[i] ? 1.0f : 0.0f;
    float vx = vel[i * 3 + 0] + ax * m;
    float vy = vel[i * 3 + 1] + ay * m;
    float vz = vel[i * 3 + 2] + az * m;
    vel[i * 3 + 0] = alive[i] ? vx : vel[i * 3 + 0];
    vel[i * 3 + 1] = alive[i] ? vy : vel[i * 3 + 1];
    vel[i * 3 + 2] = alive[i] ? vz : vel[i * 3 + 2];
    pos[i * 3 + 0] += vx * dt * m;
    pos[i * 3 + 1] += vy * dt * m;
    pos[i * 3 + 2] += vz * dt * m;
    const float l = life[i] - dt * m;
    life[i] = l;
    alive[i] = alive[i] && l > 0.0f;
    const float ml = maxlife[i] > 1e-9f ? maxlife[i] : 1e-9f;
    const float t = 1.0f - l / ml;
    t01[i] = t < 0.0f ? 0.0f : (t > 1.0f ? 1.0f : t);
  }
}

// Camera-facing billboard expansion: for each live particle write 4
// quad corners (right/up are the camera basis vectors) — the vertex
// stream for the forward OIT raster.  Returns the number of quads.
int32_t datum_particles_billboards(const float* __restrict pos,   // (n, 3)
                                   const float* __restrict size,  // (n, 2)
                                   const float* __restrict rot,   // (n,)
                                   const uint8_t* __restrict alive,
                                   int32_t n, int32_t max_quads,
                                   const float* __restrict right,  // (3,)
                                   const float* __restrict up,     // (3,)
                                   float* __restrict out_pos) {    // (4q, 3)
  int32_t q = 0;
  for (int32_t i = 0; i < n && q < max_quads; ++i) {
    if (!alive[i]) continue;
    const float sx = size[i * 2 + 0], sy = size[i * 2 + 1];
    const float c = __builtin_cosf(rot[i]), s = __builtin_sinf(rot[i]);
    float rx[3], uy[3];
    for (int k = 0; k < 3; ++k) {
      rx[k] = (right[k] * c + up[k] * s) * sx;
      uy[k] = (-right[k] * s + up[k] * c) * sy;
    }
    const float* p = pos + i * 3;
    float* o = out_pos + q * 12;
    for (int k = 0; k < 3; ++k) {
      o[0 + k] = p[k] - rx[k] - uy[k];
      o[3 + k] = p[k] + rx[k] - uy[k];
      o[6 + k] = p[k] + rx[k] + uy[k];
      o[9 + k] = p[k] - rx[k] + uy[k];
    }
    ++q;
  }
  return q;
}

}  // extern "C"
