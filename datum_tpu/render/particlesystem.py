"""Particle system: emitters, distributions, vectorized CPU simulation.

Reference parity: src/renderer/particlesystem.{h,cpp} —
Distribution<T> (constant/uniform/table, particlesystem.h:20-79),
ParticleEmitter modules (shape/scale/rotate/color/layer over life,
stretch, :86-159), SoA particle instance (:171-189), CPU update: emit
(rate + bursts), integrate velocity/acceleration, evaluate over-life
modules, camera-facing transforms (particlesystem.cpp:395+).  The
simulation is vectorized numpy over all live particles; emission uses
a deterministic per-instance RNG.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..math.bound import Bound3

_native_lib = False     # tri-state: False = unprobed, None = unavailable


def _native_particles():
    """ctypes handle to the native particle integrator, or None."""
    global _native_lib
    if _native_lib is False:
        from ..native import probe
        _native_lib = probe("datum_particles_integrate")
    return _native_lib


class Distribution:
    """Scalar/vector distribution over particle life or emission."""

    def __init__(self, kind, a=None, b=None, table=None):
        self.kind = kind
        self.a = a
        self.b = b
        self.table = table

    @classmethod
    def constant(cls, v):
        return cls("constant", a=np.asarray(v, np.float32))

    @classmethod
    def uniform(cls, lo, hi):
        return cls("uniform", a=np.asarray(lo, np.float32),
                   b=np.asarray(hi, np.float32))

    @classmethod
    def table(cls, values):
        return cls("table", table=np.asarray(values, np.float32))

    def sample(self, n, rng):
        """Random draw per particle (emission-time use)."""
        if self.kind == "constant":
            return np.broadcast_to(self.a, (n,) + np.shape(self.a)).copy()
        if self.kind == "uniform":
            u = rng.rand(n, *np.shape(self.a)) if np.shape(self.a) else rng.rand(n)
            return (self.a + (self.b - self.a) * u).astype(np.float32)
        idx = rng.randint(0, len(self.table), n)
        return self.table[idx]

    def evaluate(self, t01):
        """Deterministic curve lookup (over-life use); t01 (N,)."""
        if self.kind == "constant":
            return np.broadcast_to(self.a, np.shape(t01) + np.shape(self.a))
        if self.kind == "uniform":
            return self.a + (self.b - self.a) * np.clip(t01, 0, 1)[..., None] \
                if np.shape(self.a) else self.a + (self.b - self.a) * np.clip(t01, 0, 1)
        x = np.clip(t01, 0, 1) * (len(self.table) - 1)
        i0 = np.floor(x).astype(np.int32)
        i1 = np.minimum(i0 + 1, len(self.table) - 1)
        f = (x - i0)
        if self.table.ndim > 1:
            f = f[..., None]
        return self.table[i0] + (self.table[i1] - self.table[i0]) * f


@dataclasses.dataclass
class ParticleEmitter:
    duration: float = 2.0
    looping: bool = True
    rate: float = 20.0
    bursts: list = dataclasses.field(default_factory=list)   # [(time, count)]
    life: Distribution = None
    size: Distribution = None                 # base size at emit
    velocity: Distribution = None             # emit speed along shape dir
    rotation: Distribution = None
    color: Distribution = None                # emit tint rgba
    emissive: float = 0.0
    acceleration: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0, -9.81, 0], np.float32))
    shape: str = "point"                      # point|sphere|hemisphere|cone
    shape_radius: float = 0.0
    shape_angle: float = 0.5                  # cone half-angle
    scale_over_life: Distribution = None
    color_over_life: Distribution = None
    rotate_over_life: Distribution = None
    layer_over_life: Distribution = None      # spritesheet layer anim
    stretch_with_velocity: float = 0.0

    def __post_init__(self):
        self.life = self.life or Distribution.uniform(1.0, 2.0)
        self.size = self.size or Distribution.constant(0.1)
        self.velocity = self.velocity or Distribution.uniform(1.0, 3.0)
        self.rotation = self.rotation or Distribution.constant(0.0)
        self.color = self.color or Distribution.constant([1, 1, 1, 1])


class ParticleInstance:
    """SoA particle state (reference: particlesystem.h:171-189)."""

    def __init__(self, maxparticles, seed=0, n_emitters=1):
        n = maxparticles
        self.position = np.zeros((n, 3), np.float32)
        self.velocity = np.zeros((n, 3), np.float32)
        self.rotation = np.zeros(n, np.float32)
        self.basesize = np.zeros(n, np.float32)
        self.size = np.zeros((n, 2), np.float32)
        self.basecolor = np.ones((n, 4), np.float32)
        self.color = np.ones((n, 4), np.float32)
        self.layer = np.zeros(n, np.float32)
        self.life = np.zeros(n, np.float32)       # remaining
        self.maxlife = np.ones(n, np.float32)
        self.alive = np.zeros(n, bool)
        self.emitter = np.zeros(n, np.int32)      # owning emitter per slot
        self.time = 0.0
        # fractional emission carry, PER emitter (the reference keeps
        # per-emitter state; a shared accumulator couples their rates)
        self.emit_accum = np.zeros(n_emitters, np.float64)
        self.rng = np.random.RandomState(seed)

    @property
    def count(self):
        return int(self.alive.sum())


class ParticleSystem:
    def __init__(self, maxparticles=1000, emitters=None, bound=None, spritesheet=0):
        self.maxparticles = maxparticles
        self.emitters = emitters or [ParticleEmitter()]
        self.bound = bound or Bound3([-5, -5, -5], [5, 5, 5])
        self.spritesheet = spritesheet

    def create(self, seed=0) -> ParticleInstance:
        return ParticleInstance(self.maxparticles, seed,
                                n_emitters=len(self.emitters))

    def update(self, instance: ParticleInstance, dt, transform, camera=None):
        inst = instance
        inst.time += dt
        rng = inst.rng

        # integrate live particles — native fused SoA pass when the
        # runtime library is present (reference: particlesystem.cpp
        # update on worker threads), numpy masked updates otherwise
        native_t01 = None
        a = inst.alive
        if a.any():
            acc = np.asarray(self.emitters[0].acceleration, np.float32)
            lib = _native_particles()
            if len(self.emitters) > 1:
                # per-emitter acceleration: numpy masked updates grouped
                # by owning emitter (the native fused pass assumes one
                # uniform acceleration — the common single-emitter case)
                for ei, em in enumerate(self.emitters):
                    ea = a & (inst.emitter == ei)
                    if not ea.any():
                        continue
                    eacc = np.asarray(em.acceleration, np.float32)
                    inst.velocity[ea] += eacc * dt
                    inst.position[ea] += inst.velocity[ea] * dt
                    inst.life[ea] -= dt
                inst.alive &= inst.life > 0
            elif lib is not None:
                import ctypes
                n = len(inst.position)
                # filled by the native pass; reused by the over-life
                # modules below (saves the numpy recompute)
                native_t01 = np.empty(n, np.float32)
                alive_u8 = inst.alive.view(np.uint8)
                lib.datum_particles_integrate(
                    inst.position.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    inst.velocity.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    inst.life.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    inst.maxlife.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    alive_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    native_t01.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    ctypes.c_int32(n),
                    acc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    ctypes.c_float(dt))
            else:
                inst.velocity[a] += acc * dt
                inst.position[a] += inst.velocity[a] * dt
                inst.life[a] -= dt
                inst.alive &= inst.life > 0

        # over-life modules, per owning emitter (reference keeps
        # per-emitter modules: particlesystem.h:86-159)
        for ei, em in enumerate(self.emitters):
            a = inst.alive if len(self.emitters) == 1 else (
                inst.alive & (inst.emitter == ei))
            if not a.any():
                continue
            t01 = (native_t01[a] if native_t01 is not None
                   else 1.0 - inst.life[a] / inst.maxlife[a])
            if em.scale_over_life is not None:
                s = em.scale_over_life.evaluate(t01)
                inst.size[a] = inst.basesize[a][:, None] * np.stack([s, s], -1) \
                    if np.ndim(s) == 1 else inst.basesize[a][:, None] * s
            if em.color_over_life is not None:
                inst.color[a] = inst.basecolor[a] * em.color_over_life.evaluate(t01)
            if em.rotate_over_life is not None:
                inst.rotation[a] += em.rotate_over_life.evaluate(t01) * dt
            if em.layer_over_life is not None:
                inst.layer[a] = em.layer_over_life.evaluate(t01)

        # emission
        for ei, em in enumerate(self.emitters):
            n_emit = 0
            # a non-looping emitter only emits during [0, duration]
            expired = (not em.looping and em.duration > 0
                       and inst.time - dt >= em.duration)
            if not expired:
                inst.emit_accum[ei] += em.rate * dt
                n_emit += int(inst.emit_accum[ei])
                inst.emit_accum[ei] -= int(inst.emit_accum[ei])
            if em.looping and em.duration > 0:
                t_mod = inst.time % em.duration
            else:
                t_mod = inst.time
            for btime, bcount in em.bursts:
                fired = t_mod - dt <= btime < t_mod                     or (btime == 0.0 and inst.time <= dt)
                if em.looping and em.duration > 0 and t_mod - dt < 0:
                    # the loop period wrapped inside this step: the
                    # window covers the end of the previous period too
                    fired = fired or btime >= (t_mod - dt) % em.duration
                if fired and not expired:
                    n_emit += bcount
            if n_emit <= 0:
                continue
            free = np.nonzero(~inst.alive)[0][:n_emit]
            n = len(free)
            if n == 0:
                continue
            pos, dirs = self._emit_shape(em, n, rng)
            world_pos = transform.transform_point(pos)
            from ..math.quaternion import quat_rotate
            world_dir = quat_rotate(transform.rotation_quat(), dirs)
            speed = em.velocity.sample(n, rng)
            if speed.ndim > 1:
                speed = speed[:, 0]
            inst.position[free] = world_pos
            inst.velocity[free] = world_dir * speed[:, None]
            life = em.life.sample(n, rng)
            inst.life[free] = life
            inst.maxlife[free] = np.maximum(life, 1e-5)
            inst.basesize[free] = em.size.sample(n, rng)
            inst.size[free] = inst.basesize[free][:, None]
            inst.rotation[free] = em.rotation.sample(n, rng)
            inst.basecolor[free] = em.color.sample(n, rng)
            inst.color[free] = inst.basecolor[free]
            inst.layer[free] = 0
            inst.emitter[free] = ei
            inst.alive[free] = True

    def _emit_shape(self, em, n, rng):
        if em.shape == "sphere":
            d = rng.randn(n, 3).astype(np.float32)
            d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
            r = em.shape_radius * rng.rand(n).astype(np.float32) ** (1 / 3)
            return d * r[:, None], d
        if em.shape == "hemisphere":
            d = rng.randn(n, 3).astype(np.float32)
            d[:, 1] = np.abs(d[:, 1])
            d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
            return d * em.shape_radius, d
        if em.shape == "cone":
            phi = rng.rand(n).astype(np.float32) * 2 * np.pi
            ct = 1 - rng.rand(n).astype(np.float32) * (1 - np.cos(em.shape_angle))
            st = np.sqrt(1 - ct * ct)
            d = np.stack([st * np.cos(phi), ct, st * np.sin(phi)], -1).astype(np.float32)
            return np.zeros((n, 3), np.float32), d
        # point
        up = np.tile(np.array([0, 1, 0], np.float32), (n, 1))
        return np.zeros((n, 3), np.float32), up
