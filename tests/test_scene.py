"""Scene/ECS tests: entities, hierarchy, systems, animation, particles,
model loading, BC3 codec."""

import numpy as np
import pytest

from datum_tpu.math import Transform
from datum_tpu.scene import (
    Scene, NameComponent, TransformComponent, MeshComponent,
    PointLightComponent, update_meshes,
)
from datum_tpu.render import Camera


class TestEntities:
    def test_create_destroy_generation(self):
        s = Scene()
        e1 = s.create_entity()
        s.add_component(e1, NameComponent, "thing")
        assert s.valid(e1)
        assert s.get_component(e1, NameComponent).name == "thing"
        s.destroy_entity(e1)
        assert not s.valid(e1)
        e2 = s.create_entity()
        assert e2.index == e1.index and e2.generation != e1.generation
        assert not s.has_component(e2, NameComponent)

    def test_storage_swap_remove(self):
        s = Scene()
        es = [s.create_entity() for _ in range(5)]
        for i, e in enumerate(es):
            s.add_component(e, NameComponent, f"n{i}")
        s.remove_component(es[1], NameComponent)
        assert not s.has_component(es[1], NameComponent)
        for i in (0, 2, 3, 4):
            assert s.get_component(es[i], NameComponent).name == f"n{i}"


class TestHierarchy:
    def test_world_transform_chain(self):
        s = Scene()
        parent = s.create_entity()
        child = s.create_entity()
        ptc = s.add_component(parent, TransformComponent, Transform.translation([1, 0, 0]))
        ctc = s.add_component(child, TransformComponent, Transform.translation([0, 2, 0]),
                              parent=ptc)
        np.testing.assert_allclose(ctc.world.translation_vec(), [1, 2, 0], atol=1e-6)
        # moving the parent invalidates the child lazily
        ptc.set_local(Transform.translation([5, 0, 0]))
        np.testing.assert_allclose(ctc.world.translation_vec(), [5, 2, 0], atol=1e-6)


class TestMeshSystem:
    def test_frustum_culling(self):
        from datum_tpu.render.context import MeshHandle

        s = Scene()
        cam = Camera()
        cam.set_projection(np.radians(60), 16 / 9)
        cam.lookat(np.array([0.0, 0, 10]), np.array([0.0, 0, 0]), np.array([0.0, 1, 0]))

        def make(pos):
            e = s.create_entity()
            s.add_component(e, TransformComponent, Transform.translation(pos))
            s.add_component(e, MeshComponent,
                            mesh=MeshHandle(0, 8, 12, [-1, -1, -1], [1, 1, 1]),
                            material=0)
            return e

        visible_e = make([0, 0, 0])
        make([500, 0, 0])            # far off-screen
        make([0, 0, 50])             # behind camera
        visible = update_meshes(s, cam)
        assert len(visible) == 1
        assert visible[0].entity == visible_e
        assert visible[0].world_bound is not None


class TestAnimator:
    def _make_anim(self):
        from datum_tpu.render.animation import Animation

        # 2 joints: root translates up over 1s; child rotates
        joints = [dict(name="root", parent=0, index=0, count=2),
                  dict(name="bone1", parent=0, index=2, count=2)]
        t_id = Transform.identity().flat()
        times = np.array([0.0, 1.0, 0.0, 1.0], np.float32)
        tfs = np.stack([
            t_id, Transform.translation([0, 2, 0]).flat(),
            t_id, Transform.translation([1, 0, 0]).flat(),
        ])
        return Animation(1.0, joints, times, tfs)

    def test_single_channel_playback(self):
        from datum_tpu.render.animation import Animator

        bind = [("root", Transform.identity().flat()),
                ("bone1", Transform.identity().flat())]
        an = Animator(bind)
        an.play(self._make_anim(), weight=1.0, rate=1.0, looping=False)
        an.update(0.5)
        root = Transform.from_flat(an.pose.bones[0])
        np.testing.assert_allclose(root.translation_vec(), [0, 1, 0], atol=1e-3)
        bone1 = Transform.from_flat(an.pose.bones[1])
        # child = root(0,1,0) * local(0.5,0,0)
        np.testing.assert_allclose(bone1.translation_vec(), [0.5, 1, 0], atol=1e-3)

    def test_blend_two_channels(self):
        from datum_tpu.render.animation import Animator, Animation

        bind = [("root", Transform.identity().flat())]
        joints = [dict(name="root", parent=0, index=0, count=2)]
        a = Animation(1.0, joints, [0.0, 1.0],
                      np.stack([Transform.translation([2, 0, 0]).flat()] * 2))
        b = Animation(1.0, joints, [0.0, 1.0],
                      np.stack([Transform.translation([0, 2, 0]).flat()] * 2))
        an = Animator(bind)
        an.play(a, weight=1.0)
        an.play(b, weight=1.0)
        an.update(0.1)
        root = Transform.from_flat(an.pose.bones[0])
        t = root.translation_vec()
        np.testing.assert_allclose(t, [1, 1, 0], atol=0.05)

    def test_character_pack_animation(self):
        from datum_tpu.asset import PackReader
        from datum_tpu.render.animation import Animator, Animation

        pack = PackReader("/root/reference/bin/character.pack")
        mesh = pack.mesh(1)
        an = Animator(mesh["bones"])
        anim = Animation.from_asset(pack.animation(2))
        an.play(anim, weight=1.0, rate=1.0)
        an.update(0.25)
        pal = an.palette()
        assert pal.shape == (len(mesh["bones"]), 8)
        # palette real parts stay near unit norm
        norms = np.linalg.norm(pal[:, :4], axis=1)
        assert np.all(norms > 0.5) and np.all(norms < 2.0)
        before = pal.copy()
        an.update(0.25)
        assert np.abs(an.palette() - before).max() > 1e-4  # actually animating


class TestParticles:
    def test_emission_and_life(self):
        from datum_tpu.render.particlesystem import ParticleSystem, ParticleEmitter, Distribution

        ps = ParticleSystem(maxparticles=500, emitters=[ParticleEmitter(
            rate=100.0, life=Distribution.constant(0.5),
            velocity=Distribution.constant(1.0))])
        inst = ps.create(seed=3)
        t = Transform.identity()
        for _ in range(10):
            ps.update(inst, 0.05, t)
        assert 20 < inst.count < 120
        # particles die after 0.5s: advance without emission
        ps.emitters[0].rate = 0.0
        for _ in range(20):
            ps.update(inst, 0.05, t)
        assert inst.count == 0

    def test_gravity_integration(self):
        from datum_tpu.render.particlesystem import ParticleSystem, ParticleEmitter, Distribution

        ps = ParticleSystem(maxparticles=10, emitters=[ParticleEmitter(
            rate=0.0, bursts=[(0.0, 5)], life=Distribution.constant(10.0),
            velocity=Distribution.constant(0.0))])
        inst = ps.create()
        ps.update(inst, 0.01, Transform.identity())
        y0 = inst.position[inst.alive][:, 1].mean()
        for _ in range(50):
            ps.update(inst, 0.02, Transform.identity())
        y1 = inst.position[inst.alive][:, 1].mean()
        assert y1 < y0 - 0.3  # fell under gravity


class TestModel:
    def test_model_roundtrip_load(self, tmp_path, rng):
        from datum_tpu.asset.pack import PackWriter, VERTEX_DTYPE
        from datum_tpu.asset import PackReader
        from datum_tpu.scene import Model
        from datum_tpu.render import RenderContext
        from datum_tpu.ops.common import FrameConfig

        w = PackWriter()
        verts = np.zeros(3, VERTEX_DTYPE)
        verts["position"] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
        w.write_mesh(1, verts, np.array([0, 1, 2]), [0, 0, 0], [1, 1, 0])
        img = rng.randint(0, 255, (1, 8, 8), dtype=np.int64).astype(np.uint32)
        w.write_image(2, 8, 8, 1, 1, 0, img.tobytes())
        w.write_model(0, [dict(type=1, texture=2)],
                      [dict(color=np.array([1, 0.5, 0.2, 1], np.float32), metalness=0.1,
                            roughness=0.4, reflectivity=0.5, emissive=0.0,
                            albedomap=1, surfacemap=0, normalmap=0)],
                      [1],
                      [dict(mesh=0, material=0,
                            transform=Transform.translation([1, 2, 3]).flat(),
                            childcount=0)])
        path = tmp_path / "model.pack"
        w.save(path)

        scene = Scene()
        ctx = RenderContext(FrameConfig(width=128, height=64, max_vertices=64,
                                        max_triangles=64, max_instances=4,
                                        enable_shadows=False))
        pack = PackReader(str(path))
        model = Model.load(scene, ctx, pack, 0)
        assert len(model.entities) == 1
        child = model.entities[0]
        tc = scene.get_component(child, TransformComponent)
        np.testing.assert_allclose(tc.world.translation_vec(), [1, 2, 3], atol=1e-5)
        mc = scene.get_component(child, MeshComponent)
        assert mc.mesh.trianglecount == 1


class TestBC3:
    def test_roundtrip(self, rng):
        from datum_tpu.tools.bc import decode_bc3, encode_bc3

        # smooth content (BC's design target); random noise is its worst case
        x, y = np.meshgrid(np.arange(16), np.arange(16))
        img = np.stack([x * 12, y * 12, (x + y) * 6, np.full_like(x, 255)],
                       -1).astype(np.uint8)
        blocks = encode_bc3(img)
        out = decode_bc3(blocks, 16, 16)
        err = np.abs(out.astype(int) - img.astype(int)).mean()
        assert err < 12, f"BC3 roundtrip error {err}"
        # noise must at least decode without error explosion
        noise = (rng.rand(8, 8, 4) * 255).astype(np.uint8)
        nout = decode_bc3(encode_bc3(noise), 8, 8)
        assert np.abs(nout.astype(int) - noise.astype(int)).mean() < 60

    def test_flat_color_exact(self):
        from datum_tpu.tools.bc import decode_bc3, encode_bc3

        img = np.full((8, 8, 4), 128, np.uint8)
        out = decode_bc3(encode_bc3(img), 8, 8)
        assert np.abs(out.astype(int) - 128).max() <= 6


class TestOcclusion:
    def test_occluder_hides_object(self):
        from datum_tpu.render.occlusion import OcclusionBuffer
        from datum_tpu.math.matrix import perspective_proj, look_at_matrix

        proj = perspective_proj(np.radians(60), 16 / 9, 0.1)
        view = look_at_matrix(np.array([0.0, 0, 10]), np.array([0.0, 0, 0]),
                              np.array([0.0, 1, 0]))
        vp = proj @ view
        buf = OcclusionBuffer()
        # big wall at z=0 covering the view
        wall = np.array([[-20, -20, 0], [20, -20, 0], [20, 20, 0], [-20, 20, 0]],
                        np.float32)
        buf.fill_elements(vp, wall, np.array([0, 1, 2, 0, 2, 3]))
        # object behind the wall -> culled
        assert not buf.visible([-1, -1, -6], [1, 1, -4], vp)
        # object in front of the wall -> visible
        assert buf.visible([-1, -1, 4], [1, 1, 6], vp)
        # off to the side (on-screen but past wall edge... use off-screen)
        assert not buf.visible([100, 100, -5], [102, 102, -4], vp)

    def test_empty_buffer_everything_visible(self):
        from datum_tpu.render.occlusion import OcclusionBuffer
        from datum_tpu.math.matrix import perspective_proj

        buf = OcclusionBuffer()
        vp = perspective_proj(np.radians(60), 16 / 9, 0.1)
        assert buf.visible([-1, -1, -6], [1, 1, -4], vp)

    def test_scene_mesh_system_occlusion_culls(self):
        """fill_occlusion + update_meshes(occlusion=...): a mesh fully
        behind an occluder-flagged wall is culled; the wall and a mesh
        in front survive (reference: the datumtest update flow filling
        OcclusionBuffer then testing visible())."""
        from datum_tpu.ops.common import FrameConfig
        from datum_tpu.render import RenderContext, primitives
        from datum_tpu.render.occlusion import OcclusionBuffer
        from datum_tpu.scene import MESH_FLAG_OCCLUDER, fill_occlusion

        cfg = FrameConfig(width=128, height=64, max_vertices=4096,
                          max_triangles=4096, max_instances=8,
                          bin_capacity=32, big_capacity=8)
        ctx = RenderContext(cfg)
        pv, pi = primitives.plane(20.0)      # XZ plane; rotate to face cam
        wall = ctx.add_mesh(pv, pi)
        sv, si = primitives.unit_sphere(8, 4)
        ball = ctx.add_mesh(sv, si)

        s = Scene()
        cam = Camera()
        cam.set_projection(np.radians(60), 16 / 9)
        cam.lookat(np.array([0.0, 0, 10]), np.array([0.0, 0, 0]),
                   np.array([0.0, 1, 0]))

        def make(mesh, pos, flags=0, rot=None):
            e = s.create_entity()
            t = Transform.translation(pos)
            if rot is not None:
                t = t * rot
            s.add_component(e, TransformComponent, t)
            return s.add_component(e, MeshComponent, mesh=mesh,
                                   material=0, flags=flags)

        face_cam = Transform.rotation([1.0, 0.0, 0.0], np.radians(90))
        wall_c = make(wall, [0, 0, 0], flags=MESH_FLAG_OCCLUDER,
                      rot=face_cam)
        hidden = make(ball, [0, 0, -6])      # behind the wall
        front = make(ball, [0, 0, 5])        # in front

        buf = OcclusionBuffer()
        fill_occlusion(s, cam, ctx.pool, buf)
        assert buf.depth.max() > 0.0         # the wall rasterized

        vis = update_meshes(s, cam, occlusion=buf)
        ents = {c.entity for c in vis}
        assert front.entity in ents
        assert wall_c.entity in ents         # occluders are never self-culled
        assert hidden.entity not in ents
        # without the buffer all three are frustum-visible
        assert len(update_meshes(s, cam)) == 3


class TestDecals:
    def test_decal_recolors_floor(self):
        from datum_tpu.ops.common import FrameConfig
        from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
        from datum_tpu.render import primitives

        cfg = FrameConfig(width=256, height=128, max_vertices=1024,
                          max_triangles=1024, max_instances=4, bin_capacity=64,
                          big_capacity=8, enable_shadows=False,
                          max_decals_active=4)
        ctx = RenderContext(cfg)
        pv, pi = primitives.plane(8.0)
        floor = ctx.add_mesh(pv, pi)
        mat = ctx.add_material(color=(0.8, 0.8, 0.8, 1))
        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([0.0, 6.0, 6.0]), np.array([0.0, 0.0, 0.0]),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=256, height=128)
        rl = RenderList()
        rl.push_mesh(floor, Transform.identity(), mat)
        rl.push_decal(Transform.translation([0, 0, 0]), [1.5, 1.0, 1.5],
                      color=(1.0, 0.05, 0.05, 1.0))
        img = ctx.render(cam, rl, params).astype(np.float32)
        centre = img[55:75, 112:144]
        outside = img[100:120, 30:60]
        assert centre[..., 0].mean() > centre[..., 1].mean() * 1.5, \
            f"decal not red: {centre.mean(axis=(0, 1))}"
        assert abs(outside[..., 0].mean() - outside[..., 1].mean()) < 10

    def test_textured_decal_alpha_and_pattern(self):
        from datum_tpu.ops.common import FrameConfig
        from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
        from datum_tpu.render import primitives

        cfg = FrameConfig(width=256, height=128, max_vertices=1024,
                          max_triangles=1024, max_instances=4, bin_capacity=64,
                          big_capacity=8, enable_shadows=False,
                          max_decals_active=4)
        ctx = RenderContext(cfg)
        pv, pi = primitives.plane(8.0)
        floor = ctx.add_mesh(pv, pi)
        mat = ctx.add_material(color=(0.8, 0.8, 0.8, 1))
        # texture: left half opaque red, right half fully transparent
        tex = np.zeros((64, 64, 4), np.uint8)
        tex[:, :32] = [255, 16, 16, 255]
        tid = ctx.add_texture(tex)
        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([0.0, 6.0, 6.0]), np.array([0.0, 0.0, 0.0]),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=256, height=128)
        rl = RenderList()
        rl.push_mesh(floor, Transform.identity(), mat)
        rl.push_decal(Transform.translation([0, 0, 0]), [2.0, 1.0, 2.0],
                      color=(1, 1, 1, 1.0), albedomap=tid)
        img = ctx.render(cam, rl, params).astype(np.float32)
        left = img[55:75, 100:124]     # decal -x half (texture red)
        right = img[55:75, 132:156]    # decal +x half (transparent)
        assert left[..., 0].mean() > left[..., 1].mean() * 1.5, \
            f"textured decal not red: {left.mean(axis=(0, 1))}"
        assert abs(right[..., 0].mean() - right[..., 1].mean()) < 12, \
            f"transparent texel tinted floor: {right.mean(axis=(0, 1))}"


class TestWindBend:
    def test_bend_preserves_length_and_moves_tops(self):
        import jax.numpy as jnp
        from datum_tpu.ops.geometry import wind_bend

        pos = np.array([[0, 0, 0], [0, 1, 0], [0, 2, 0], [1, 0.1, 0]], np.float32)
        bent = np.asarray(wind_bend(jnp.asarray(pos), [0.5, 0, 0], [0, 0.5, 0]))
        # lengths preserved
        np.testing.assert_allclose(np.linalg.norm(bent, axis=1),
                                   np.linalg.norm(pos, axis=1), atol=1e-5)
        # taller vertices bend more toward +x
        assert bent[2, 0] > bent[1, 0] > 0
        assert abs(bent[0, 0]) < 1e-6

    def test_detail_bend_animates(self):
        import jax.numpy as jnp
        from datum_tpu.ops.geometry import wind_detail_bend

        pos = jnp.asarray(np.array([[0, 1, 0], [0.5, 1.5, 0]], np.float32))
        a = np.asarray(wind_detail_bend(pos, np.ones(3), 0.0, [0.2, 0, 0], [0, 1, 0]))
        b = np.asarray(wind_detail_bend(pos, np.ones(3), 0.37, [0.2, 0, 0], [0, 1, 0]))
        assert np.abs(a - b).max() > 1e-4


class TestTerrain:
    def test_heightmap_mesh(self):
        from datum_tpu.render.terrain import make_terrain_mesh, terrain_lod_chain
        from datum_tpu.math.perlin import PerlinEngine

        eng = PerlinEngine(3)
        xs, ys = np.meshgrid(np.linspace(0, 4, 33), np.linspace(0, 4, 33))
        hm = eng.noise2(xs, ys) * 0.5 + 0.5
        verts, idx = make_terrain_mesh(hm, size=32.0, height_scale=4.0)
        assert len(verts["position"]) == 33 * 33
        assert idx.max() < len(verts["position"])
        n = np.linalg.norm(verts["normal"], axis=1)
        np.testing.assert_allclose(n, 1.0, atol=1e-4)
        assert verts["position"][:, 1].std() > 0.1   # actually displaced
        lods = terrain_lod_chain(hm, levels=3)
        assert len(lods[2][0]["position"]) < len(lods[0][0]["position"])
