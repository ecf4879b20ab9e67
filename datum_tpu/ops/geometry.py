"""Vertex stage: rigid and dual-quaternion-skinned vertex transforms.

TPU re-design of the reference vertex shaders (reference:
data/model.geometry.vert — rigid; data/actor.geometry.vert:38-47 —
4-bone dual-quaternion skinning via transform_blend;
data/transform.inc — quaternion helpers).  All vertices of all draws
are processed in one batched pass: big dense matmuls for the MXU, a
gather + blend for skinning palettes.
"""

from __future__ import annotations

import jax.numpy as jnp


def dq_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4) [w,x,y,z]."""
    qv = q[..., 1:4]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def dq_apply(real, dual, v):
    """Apply dual-quaternion rigid transform to points v."""
    t = 2.0 * quat_mul(dual, quat_conj(real))[..., 1:4]
    return dq_rotate(real, v) + t


def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def transform_vertices_rigid(positions, normals, tangents, vtx_instance,
                             inst_world, viewproj):
    """Rigid path: world = M_inst * p; clip = VP * world.

    positions: (V, 3); vtx_instance: (V,) int32; inst_world: (I, 3, 4);
    viewproj: (4, 4).  Returns clip (V,4), wnormal (V,3), wtangent (V,4).
    """
    V = positions.shape[0]
    # SoA: one row gather + one (V,12)->(12,V) relayout, then all math on
    # (V,)-lane arrays — the einsum over (V,3,4) AoS wastes 124/128 lanes
    M = inst_world[vtx_instance].reshape(V, 12).T              # (12, V)
    pT, nT, tT = positions.T, normals.T, tangents.T
    wx = M[0] * pT[0] + M[1] * pT[1] + M[2] * pT[2] + M[3]
    wy = M[4] * pT[0] + M[5] * pT[1] + M[6] * pT[2] + M[7]
    wz = M[8] * pT[0] + M[9] * pT[1] + M[10] * pT[2] + M[11]
    nx = M[0] * nT[0] + M[1] * nT[1] + M[2] * nT[2]
    ny = M[4] * nT[0] + M[5] * nT[1] + M[6] * nT[2]
    nz = M[8] * nT[0] + M[9] * nT[1] + M[10] * nT[2]
    tx = M[0] * tT[0] + M[1] * tT[1] + M[2] * tT[2]
    ty = M[4] * tT[0] + M[5] * tT[1] + M[6] * tT[2]
    tz = M[8] * tT[0] + M[9] * tT[1] + M[10] * tT[2]
    vp = viewproj
    clip = jnp.stack([vp[0, 0] * wx + vp[0, 1] * wy + vp[0, 2] * wz + vp[0, 3],
                      vp[1, 0] * wx + vp[1, 1] * wy + vp[1, 2] * wz + vp[1, 3],
                      vp[2, 0] * wx + vp[2, 1] * wy + vp[2, 2] * wz + vp[2, 3],
                      vp[3, 0] * wx + vp[3, 1] * wy + vp[3, 2] * wz + vp[3, 3]],
                     axis=-1)
    world = jnp.stack([wx, wy, wz], axis=-1)
    wn = jnp.stack([nx, ny, nz], axis=-1)
    wtangent = jnp.stack([tx, ty, tz, tT[3]], axis=-1)
    return clip, wn, wtangent, world


def skin_vertices(positions, normals, tangents, bone_idx, bone_wt,
                  palettes_flat, pal_of_vertex, max_bones):
    """4-bone dual-quat skinning with flat palette rows.

    palettes_flat: (P*B, 8); pal_of_vertex: (V,) palette index per
    vertex.  Gathers exactly 4 palette rows per vertex (reference:
    data/actor.geometry.vert:38-47 transform_blend of bone0..3).
    """
    rows = palettes_flat[pal_of_vertex[:, None] * max_bones + bone_idx]  # (V,4,8)
    ref = rows[:, 0:1, :4]
    sign = jnp.sign(jnp.sum(rows[..., :4] * ref, axis=-1, keepdims=True) + 1e-20)
    w = (bone_wt * sign[..., 0])[..., None]
    blended = jnp.sum(rows * w, axis=1)
    real, dual = blended[:, :4], blended[:, 4:]
    ln = jnp.maximum(jnp.linalg.norm(real, axis=-1, keepdims=True), 1e-8)
    real = real / ln
    dual = dual / ln
    skinned = dq_apply(real, dual, positions)
    sn = dq_rotate(real, normals)
    st = dq_rotate(real, tangents[:, :3])
    return skinned, sn, jnp.concatenate([st, tangents[:, 3:4]], -1)


def transform_vertices_skinned(positions, normals, tangents, vtx_instance,
                               bone_idx, bone_wt, palettes, inst_world, viewproj):
    """Skinned path: p' = blend(palette)(p), then rigid instance transform.

    palettes: (I, B, 8) per-instance bone dual-quats (already composed
    with bind pose by the host Animator).
    """
    max_bones = palettes.shape[1]
    skinned, sn, st = skin_vertices(positions, normals, tangents, bone_idx,
                                    bone_wt, palettes.reshape(-1, 8),
                                    vtx_instance, max_bones)
    return transform_vertices_rigid(skinned, sn, st, vtx_instance, inst_world,
                                    viewproj)


def terrain_morph(positions, normals, morph6, vtx_draw, world, morph_range,
                  campos):
    """Terrain LOD geomorph (reference: data/terrain.geometry.vert —
    alpha = smoothstep(morphbeg, morphend, distance(camerapos.xy,
    vertex.xy)); xy = mix(vertex, floor-snapped coarse grid point,
    alpha)).

    The TPU build bakes the snap target at asset-build time instead of
    re-sampling the heightmap in the vertex stage (a per-vertex texture
    gather): morph6[:, :3] is the LOCAL-space position delta to the
    coarse-grid target, morph6[:, 3:6] the normal delta.  The morph
    factor uses horizontal (x, z) distance from the camera in mesh-local
    space — our terrain plane is xz with height y (the reference's is xy
    with height z).

    morph_range: (D, 2) [morphbeg, morphend] per draw; end <= 0 disables
    (the draw_arrays default).  world: (D, 3, 4) rigid affines.
    """
    R = world[:, :, :3]                            # (D, 3, 3), rigid
    t = world[:, :, 3]
    cam_local = jnp.einsum("dji,dj->di",
                           R, campos[None, :] - t)  # R^T (c - t)
    cl = cam_local[vtx_draw]
    beg = morph_range[vtx_draw, 0]
    end = morph_range[vtx_draw, 1]
    dx = positions[:, 0] - cl[:, 0]
    dz = positions[:, 2] - cl[:, 2]
    d = jnp.sqrt(dx * dx + dz * dz)
    tt = jnp.clip((d - beg) / jnp.maximum(end - beg, 1e-6), 0.0, 1.0)
    alpha = tt * tt * (3.0 - 2.0 * tt)             # smoothstep
    alpha = jnp.where(end > 0, alpha, 0.0)[:, None]
    positions = positions + morph6[:, :3] * alpha
    nrm = normals + morph6[:, 3:6] * alpha
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True),
                            1e-9)
    return positions, nrm


def wind_bend(positions, wind, scale):
    """Main foliage bend (reference: data/transform.inc:156-165
    transform_bend): bend factor from height, renormalized to preserve
    the vertex's distance from the pivot.

    positions: (V, 3) LOCAL mesh-space positions; wind: (3,) direction *
    strength; scale: (3,) height weighting (typically (0, 1/h, 0)).
    """
    bf = positions @ jnp.asarray(scale, jnp.float32)
    bf = bf + 1.0
    bf = bf * bf
    bf = bf * bf - bf
    bent = positions + jnp.asarray(wind, jnp.float32) * bf[:, None]
    ln = jnp.linalg.norm(positions, axis=-1, keepdims=True)
    bln = jnp.maximum(jnp.linalg.norm(bent, axis=-1, keepdims=True), 1e-9)
    return bent / bln * ln


def wind_detail_bend(positions, world_anchor, time, wind, scale):
    """Per-vertex flutter (reference: transform.inc:169-181
    transform_detailbend): two incommensurate triangle waves phased by
    position.  NOTE: the phase = dot(v, vec3(sum(anchor))) formula is
    the reference's EXACT math (transform.inc:173) including its
    degenerate case (anchor components summing to 0 -> uniform phase).
    render/frame.py inlines the same math on the SoA path — keep them
    in sync."""
    phase = positions @ jnp.full((3,), jnp.sum(world_anchor), jnp.float32)
    w = jnp.stack([(time + phase) * 1.975, (time + phase) * 0.793], -1)
    waves = jnp.mod(w, 1.0) * 2.0 - 1.0
    waves = jnp.abs(jnp.mod(waves + 0.5, 1.0) * 2.0 - 1.0)
    waves = waves * waves * (3.0 - 2.0 * waves)
    wavesum = waves.sum(-1)
    hf = positions @ jnp.asarray(scale, jnp.float32)
    return positions + jnp.asarray(wind, jnp.float32) * (wavesum * hf)[:, None]
