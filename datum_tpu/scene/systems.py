"""Per-frame scene systems.

Reference parity: update_meshes (src/scene/meshcomponent.cpp:119),
update_actors (actorcomponent.cpp:127), update_particlesystems
(particlesystemcomponent.cpp:70).  Each frustum-culls against the
camera before doing work (reference: actorcomponent.cpp:129-142) and
appends visible content to the renderlist.
"""

from __future__ import annotations

import numpy as np

from .components import (
    ActorComponent, MeshComponent, ParticleSystemComponent, PointLightComponent,
    SpotLightComponent, TransformComponent,
)


def update_meshes(scene, camera, renderlist=None):
    """Refresh world bounds, frustum-cull, push visible meshes."""
    storage = scene.storage(MeshComponent)
    frustum = camera.frustum()
    visible = []
    for comp in storage.rows():
        tc = scene.get_component(comp.entity, TransformComponent)
        world = tc.world
        comp.world_bound = comp.mesh.bound().transformed(world)
        if frustum.intersects_bound(comp.world_bound):
            visible.append(comp)
            if renderlist is not None:
                renderlist.push_mesh(comp.mesh, world, comp.material)
    return visible


def update_actors(scene, camera, dt, renderlist=None):
    """Advance animators for visible actors, push skinned draws."""
    storage = scene.storage(ActorComponent)
    frustum = camera.frustum()
    visible = []
    for comp in storage.rows():
        tc = scene.get_component(comp.entity, TransformComponent)
        world = tc.world
        comp.world_bound = comp.mesh.bound().transformed(world)
        # conservative: animated bounds inflate by 25% (reference inflates
        # via rig extents)
        from ..math.bound import bound_expand
        bound = bound_expand(comp.world_bound, 0.25 * comp.world_bound.radius)
        if frustum.intersects_bound(bound):
            if comp.animator is not None:
                comp.animator.update(dt)
            visible.append(comp)
            if renderlist is not None and hasattr(renderlist, "push_actor"):
                renderlist.push_actor(comp.mesh, world, comp.material,
                                      comp.animator.palette())
    return visible


def update_particlesystems(scene, camera, dt, renderlist=None):
    """Step CPU particle sims for visible systems."""
    storage = scene.storage(ParticleSystemComponent)
    frustum = camera.frustum()
    visible = []
    for comp in storage.rows():
        tc = scene.get_component(comp.entity, TransformComponent)
        if comp.instance is None and comp.system is not None:
            comp.instance = comp.system.create()
        if comp.instance is None:
            continue
        bound = comp.system.bound.transformed(tc.world)
        if frustum.intersects_bound(bound):
            comp.system.update(comp.instance, dt, tc.world, camera)
            visible.append(comp)
            if renderlist is not None and hasattr(renderlist, "push_particles"):
                renderlist.push_particles(comp.instance)
    return visible


def gather_lights(scene, renderlist):
    """Push light components into the renderlist."""
    for comp in scene.storage(PointLightComponent).rows():
        tc = scene.get_component(comp.entity, TransformComponent)
        renderlist.push_pointlight(tc.world.translation_vec(), comp.intensity,
                                   comp.attenuation)
    for comp in scene.storage(SpotLightComponent).rows():
        tc = scene.get_component(comp.entity, TransformComponent)
        direction = tc.world.transform_point(np.array([0, 0, -1.0], np.float32)) \
            - tc.world.translation_vec()
        renderlist.push_spotlight(tc.world.translation_vec(), direction,
                                  comp.intensity, comp.cutoff, comp.attenuation)
