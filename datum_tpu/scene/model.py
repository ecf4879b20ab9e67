"""Model: compound entity from a MODL asset.

Reference parity: src/scene/model.{h,cpp} — loading a model asset
creates its textures/materials/meshes in the render context and spawns
child mesh entities per instance record (reference: model.cpp:36-48).
"""

from __future__ import annotations

import numpy as np

from ..math import Transform
from .components import MeshComponent, NameComponent, TransformComponent


class Model:
    def __init__(self, entity, entities, meshes, materials, textures):
        self.entity = entity
        self.entities = entities       # child mesh entities
        self.meshes = meshes
        self.materials = materials
        self.textures = textures

    @classmethod
    def load(cls, scene, ctx, pack, model_asset_id, transform=None):
        """Instantiate a MODL asset into the scene.

        scene: scene.Scene; ctx: render.RenderContext; pack: PackReader
        holding the model and its referenced mesh/texture assets (ids in
        the model payload are pack-local asset ids).
        """
        decoded = pack.model(model_asset_id)

        # textures
        tex_map = {}
        from ..math import color as color_codec
        from ..asset.pack import IMAGE_RGBA_BC3, IMAGE_RGBE
        for i, t in enumerate(decoded["textures"]):
            if t["texture"] == 0:
                tex_map[i] = None
                continue
            img = pack.image(t["texture"])
            base = img["mips"][0][0]     # layer 0, top mip
            if img["format"] == IMAGE_RGBE:
                rgba = np.clip(color_codec.unpack_rgbe(base) * 255, 0, 255).astype(np.uint8)
                rgba = np.concatenate([rgba, np.full(rgba.shape[:2] + (1,), 255, np.uint8)], -1)
            elif img["format"] == IMAGE_RGBA_BC3:
                from ..tools.bc import decode_bc3
                rgba = decode_bc3(base, img["width"], img["height"])
            else:
                rgba = base.view(np.uint8).reshape(base.shape + (4,))
                # pack stores B,G,R,A byte order (reference color.h rgba)
                rgba = rgba[..., [2, 1, 0, 3]]
            tex_map[i] = ctx.add_texture(rgba)

        # materials
        mat_ids = []
        for m in decoded["materials"]:
            kw = dict(color=tuple(m["color"]), metalness=m["metalness"],
                      roughness=m["roughness"], reflectivity=m["reflectivity"],
                      emissive=m["emissive"])
            if m["albedomap"] and tex_map.get(m["albedomap"] - 1) is not None:
                kw["albedomap"] = tex_map[m["albedomap"] - 1]
            if m["surfacemap"] and tex_map.get(m["surfacemap"] - 1) is not None:
                kw["surfacemap"] = tex_map[m["surfacemap"] - 1]
            if m["normalmap"] and tex_map.get(m["normalmap"] - 1) is not None:
                kw["normalmap"] = tex_map[m["normalmap"] - 1]
            mat_ids.append(ctx.add_material(**kw))

        # meshes
        mesh_handles = []
        for mid in decoded["meshes"]:
            md = pack.mesh(mid)
            mesh_handles.append(ctx.add_mesh(md["vertices"], md["indices"],
                                             mincorner=md["mincorner"],
                                             maxcorner=md["maxcorner"]))

        # entities
        root = scene.create_entity()
        root_tc = scene.add_component(root, TransformComponent,
                                      transform or Transform.identity())
        scene.add_component(root, NameComponent, f"model:{model_asset_id}")
        children = []
        # flat parenting matches the reference: Model::load ignores the
        # wire format's childcount (always 0 from objparser) and parents
        # every instance to the model root (model.cpp:123-125, :208-213)
        for inst in decoded["instances"]:
            e = scene.create_entity()
            local = Transform.from_flat(inst["transform"])
            scene.add_component(e, TransformComponent, local, parent=root_tc)
            scene.add_component(e, MeshComponent,
                                mesh=mesh_handles[inst["mesh"]],
                                material=mat_ids[inst["material"]])
            children.append(e)
        return cls(root, children, mesh_handles, mat_ids, tex_map)
