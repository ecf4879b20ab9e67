"""Entity-component scene graph.

Reference parity: src/scene/* — Scene with generation-checked entity
ids, pluggable SoA component storages, transform hierarchy, per-frame
systems (update_meshes/update_actors/update_particlesystems) that
frustum-cull before updating, and Model compound entities loaded from
MODL assets.
"""

from .scene import Scene, EntityId
from .storage import DefaultStorage
from .components import (
    NameComponent, TransformComponent, SpriteComponent, MeshComponent,
    ActorComponent, PointLightComponent, SpotLightComponent,
    ParticleSystemComponent,
)
from .systems import (MESH_FLAG_OCCLUDER, fill_occlusion, update_meshes,
                      update_actors, update_particlesystems)
from .model import Model
