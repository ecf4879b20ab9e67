"""Procedural built-in meshes.

Generates the core-pack primitive set (reference: src/corepack.h —
unit_quad/cube/cone/hemi/sphere, line_*; built offline by
tools/assetbuilder.cpp mesh writers).  Vertices carry the standard
layout {position, texcoord, normal, tangent(xyz,w)}.
"""

from __future__ import annotations

import numpy as np


def _mesh(pos, uv, nrm, tan, idx):
    return dict(position=np.asarray(pos, np.float32),
                texcoord=np.asarray(uv, np.float32),
                normal=np.asarray(nrm, np.float32),
                tangent=np.asarray(tan, np.float32)), np.asarray(idx, np.int32)


def unit_quad():
    """XY quad from (-1,-1) to (1,1), facing +Z."""
    pos = [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]]
    uv = [[0, 0], [1, 0], [1, 1], [0, 1]]
    nrm = [[0, 0, 1]] * 4
    tan = [[1, 0, 0, 1]] * 4
    return _mesh(pos, uv, nrm, tan, [0, 1, 2, 0, 2, 3])


def unit_cube():
    """Axis-aligned cube [-1, 1]^3, outward normals, per-face uvs."""
    faces = [
        ((0, 0, 1), (1, 0, 0), (0, 1, 0)),
        ((0, 0, -1), (-1, 0, 0), (0, 1, 0)),
        ((1, 0, 0), (0, 0, -1), (0, 1, 0)),
        ((-1, 0, 0), (0, 0, 1), (0, 1, 0)),
        ((0, 1, 0), (1, 0, 0), (0, 0, -1)),
        ((0, -1, 0), (1, 0, 0), (0, 0, 1)),
    ]
    pos, uv, nrm, tan, idx = [], [], [], [], []
    for n, t, b in faces:
        n, t, b = np.array(n, np.float32), np.array(t, np.float32), np.array(b, np.float32)
        base = len(pos)
        for su, sv in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
            pos.append(n + su * t + sv * b)
            uv.append([(su + 1) / 2, (sv + 1) / 2])
            nrm.append(n)
            tan.append([*t, 1.0])
        idx += [base, base + 1, base + 2, base, base + 2, base + 3]
    return _mesh(pos, uv, nrm, tan, idx)


def unit_sphere(segments=32, rings=16):
    """Unit sphere, lat-long parameterisation."""
    pos, uv, nrm, tan, idx = [], [], [], [], []
    for r in range(rings + 1):
        theta = np.pi * r / rings
        for s in range(segments + 1):
            phi = 2 * np.pi * s / segments
            p = [np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)]
            pos.append(p)
            uv.append([s / segments, r / rings])
            nrm.append(p)
            tan.append([-np.sin(phi), 0, np.cos(phi), 1.0])
    for r in range(rings):
        for s in range(segments):
            a = r * (segments + 1) + s
            b = a + segments + 1
            idx += [a, b, a + 1, a + 1, b, b + 1]
    return _mesh(pos, uv, nrm, tan, idx)


def unit_hemi(segments=32, rings=8):
    """Upper hemisphere of the unit sphere."""
    pos, uv, nrm, tan, idx = [], [], [], [], []
    for r in range(rings + 1):
        theta = 0.5 * np.pi * r / rings
        for s in range(segments + 1):
            phi = 2 * np.pi * s / segments
            p = [np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)]
            pos.append(p)
            uv.append([s / segments, r / rings])
            nrm.append(p)
            tan.append([-np.sin(phi), 0, np.cos(phi), 1.0])
    for r in range(rings):
        for s in range(segments):
            a = r * (segments + 1) + s
            b = a + segments + 1
            idx += [a, b, a + 1, a + 1, b, b + 1]
    return _mesh(pos, uv, nrm, tan, idx)


def unit_cone(segments=32):
    """Cone: apex at origin, unit-radius base at z=-1 (spot-light volume)."""
    pos, uv, nrm, tan, idx = [[0, 0, 0]], [[0.5, 0.5]], [[0, 0, 1]], [[1, 0, 0, 1]], []
    for s in range(segments + 1):
        phi = 2 * np.pi * s / segments
        c, sn = np.cos(phi), np.sin(phi)
        pos.append([c, sn, -1.0])
        uv.append([s / segments, 1.0])
        n = np.array([c, sn, 1.0]) / np.sqrt(2)
        nrm.append(n.tolist())
        tan.append([-sn, c, 0, 1.0])
    for s in range(segments):
        idx += [0, 1 + s, 2 + s]
    # base cap
    base = len(pos)
    pos.append([0, 0, -1.0])
    uv.append([0.5, 0.5])
    nrm.append([0, 0, -1.0])
    tan.append([1, 0, 0, 1])
    for s in range(segments):
        idx += [base, 2 + s, 1 + s]
    return _mesh(pos, uv, nrm, tan, idx)


def plane(size=1.0, reps=1.0):
    """Ground plane in XZ facing +Y (reference: src/renderer/mesh.h:87
    make_plane helper)."""
    pos = [[-size, 0, -size], [size, 0, -size], [size, 0, size], [-size, 0, size]]
    uv = [[0, 0], [reps, 0], [reps, reps], [0, reps]]
    nrm = [[0, 1, 0]] * 4
    tan = [[1, 0, 0, 1]] * 4
    return _mesh(pos, uv, nrm, tan, [0, 2, 1, 0, 3, 2])


def terrain(size=32.0, n=128, height=2.0, seed=7, reps=8.0, morph_grid=0):
    """Dense displaced ground grid: n x n quads (2*n^2 triangles) with
    fBm perlin heights — the procedural stand-in for a Sponza-class
    dense mesh (reference: test/datumtest.cpp:175-202 Sponza block).
    Normals from central differences."""
    from ..math.perlin import PerlinEngine

    eng = PerlinEngine(seed)
    xs = np.linspace(-size, size, n + 1, dtype=np.float32)
    zs = np.linspace(-size, size, n + 1, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs, indexing="xy")
    h = eng.fbm3(gx * (4.0 / size), np.zeros_like(gx),
                 gz * (4.0 / size), octaves=4) * height
    # central-difference normals
    step = 2.0 * size / n
    dx = np.gradient(h, step, axis=1)
    dz = np.gradient(h, step, axis=0)
    nrm = np.stack([-dx, np.ones_like(h), -dz], -1)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)

    pos = np.stack([gx, h, gz], -1).reshape(-1, 3)
    uv = np.stack([(gx + size) / (2 * size) * reps,
                   (gz + size) / (2 * size) * reps], -1).reshape(-1, 2)
    tan = np.concatenate([np.tile(np.float32([1, 0, 0]),
                                  (pos.shape[0], 1)),
                          np.ones((pos.shape[0], 1), np.float32)], -1)
    r = np.arange(n, dtype=np.int32)
    a = (r[:, None] * (n + 1) + r[None, :]).ravel()   # row-major cell origin
    b = a + n + 1
    idx = np.stack([a, b, a + 1, a + 1, b, b + 1], -1).reshape(-1)
    verts, tris = _mesh(pos, uv, nrm.reshape(-1, 3), tan, idx)
    if morph_grid > 0:      # LOD geomorph targets (render/terrain.py)
        from .terrain import grid_morph_targets
        mp, mn = grid_morph_targets(np.stack([gx, h, gz], -1), nrm,
                                    morph_grid)
        verts["morph_position"] = mp
        verts["morph_normal"] = mn
    return verts, tris


def line_cube():
    """Wireframe cube line list (pairs of endpoints)."""
    corners = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                       np.float32)
    edges = [(0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3), (2, 6),
             (3, 7), (4, 5), (4, 6), (5, 7), (6, 7)]
    return corners, np.asarray(edges, np.int32)


def line_quad():
    """Unit quad outline line list (reference: core line_quad mesh)."""
    corners = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                       np.float32)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    return corners, np.asarray(edges, np.int32)


def line_cone(segments=16):
    """Unit cone outline: base circle + 4 spokes to the apex
    (reference: core line_cone mesh)."""
    ang = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    base = np.stack([np.cos(ang), np.sin(ang), np.ones_like(ang)], -1)
    pos = np.concatenate([base, [[0.0, 0.0, 0.0]]], 0).astype(np.float32)
    edges = [(i, (i + 1) % segments) for i in range(segments)]
    edges += [(i, segments) for i in range(0, segments, segments // 4)]
    return pos, np.asarray(edges, np.int32)
