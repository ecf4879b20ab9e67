"""Shared configuration and helpers for device kernels."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

# Raster tile size: 32 rows x 128 cols — the TPU lane width is 128 and
# fp32 sublane tiling is 8, so a (32, 128) tile is 4 VPU registers per
# array op and streams through VMEM cleanly.
TILE_H = 32
TILE_W = 128

# Scene capacity bounds — identical to the reference SceneSet capacities
# (reference: src/renderer/renderer.cpp:226-238, data/lighting.inc:2-8)
MAX_POINT_LIGHTS = 512
MAX_SPOT_LIGHTS = 16
MAX_PROBES = 128
MAX_ENVIRONMENTS = 8
MAX_DECALS = 128
SHADOW_SLICES = 4
SHADOW_RES = 1024
CLUSTER_TILE = 64
CLUSTER_SIZE_Z = 24

# Fog froxel grid (reference: src/renderer/renderer.cpp:293-298)
FOG_W, FOG_H, FOG_D = 160, 90, 64
FOG_DEPTH_RANGE = 50.0
FOG_DEPTH_EXPONENT = 3.0


def gather_row8(flat, idx):
    """flat[idx] for f32 tables as 8-wide row fetches + a lane select.

    The TPU gather engine is per-ROW: element gathers from flat f32
    tables sustain ~150 M rows/s, while the same values fetched as
    (idx >> 3) rows of 8 lanes run ~3x faster (measured on the spot
    ESM tap: 0.87 -> ~0.3 ms at 130k taps).  The lane select
    (iota == idx & 7, sum) is exact — the result is bit-identical to
    flat[idx].  Requires flat.size % 8 == 0 (pow2 map areas always are).
    """
    import jax
    rows = flat.reshape(-1, 8)[idx >> 3]                 # (..., 8)
    lane = (idx & 7)[..., None]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1,) * idx.ndim + (8,),
                                    idx.ndim)
    return jnp.sum(jnp.where(iota == lane, rows, 0.0), -1)


def gather_pair8(pairs, idx):
    """pairs[idx] for an (N, 2) f32 pair table -> (..., 2), via 8-lane
    rows (4 pairs each) + two exact lane selects; see gather_row8."""
    import jax
    rows = pairs.reshape(-1, 8)[idx >> 2]                # (..., 8)
    k2 = ((idx & 3) * 2)[..., None]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1,) * idx.ndim + (8,),
                                    idx.ndim)
    a = jnp.sum(jnp.where(iota == k2, rows, 0.0), -1)
    b = jnp.sum(jnp.where(iota == k2 + 1, rows, 0.0), -1)
    return jnp.stack([a, b], -1)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(a: int, b: int) -> int:
    return cdiv(a, b) * b


@dataclasses.dataclass(frozen=True)
class FrameConfig:
    """Static (jit-constant) frame configuration.

    Equivalent of the reference's spec-constant table + pipeline config
    (reference: src/renderer/renderer.cpp:258-350 ComputeConstants,
    renderer.h:481-486 RenderPipelineConfig).
    """

    width: int = 1280
    height: int = 720
    # triangles per raster tile; None auto-sizes to a fixed total-pairs
    # budget divided over the tiles, so small framebuffers (few tiles)
    # get deep bins for free while big ones keep the gather cost bounded
    bin_capacity: int | None = None
    big_capacity: int = 64           # screen-crossing triangles (w<=0 spans)
    bin_max_span: int = 16           # pair-expansion width: sort array is
                                     # max_span*T entries; wider tris -> big list
    max_vertices: int = 1 << 16
    max_triangles: int = 1 << 16
    max_instances: int = 256
    tile_light_capacity: int = 64    # point lights per cluster tile
    enable_shadows: bool = True
    shadow_res: int = 1024
    shadow_bin_capacity: int = 128
    shadow_mode: str = "esm"         # 'esm' (1-tap) or 'pcf' (12-tap poisson)
    # render cascades 2..3 at this reduced resolution (esm mode only):
    # their world extent is 2-4x the near cascades', so 1024^2 far maps
    # are sub-screen-pixel; the ESM blurs at native res and upsamples
    shadow_far_res: int | None = None
    shadow_factor_scale: int = 2     # ESM factor res divisor (2=half, 4=quarter)
    # cascade slice-boundary lerp (reference: lighting.comp:63-95): mix
    # into the next slice over this trailing fraction of each split
    # range.  Hides cascade seams for one extra factor tap; 0 = off
    shadow_slice_blend: float = 0.0
    enable_material_maps: bool = True  # sample surface/normal textures
    use_pallas: bool = False         # Mosaic raster kernel (TPU only)
    # 'v2' scalar-loop kernel is the default: the 'mxu' matmul-chunk
    # formulation measured 41.4 ms vs v2's 33.0 ms on the bench scene and
    # loses edge-function precision to the MXU's bf16 mantissa (0.77 vis
    # agreement on hardware) — kept selectable for sparse-bin scenes.
    raster_kernel: str = "v2"
    # two-phase fused raster: depth/slot prepass + winner-gated
    # attribute walk (skips the interpolate+select block for occluded
    # triangles); bit-identical outputs, selectable for A/B timing
    raster_two_phase: bool = False
    # early-z exit: suffix depth bounds let the raster/shadow kernels
    # stop walking a bin once everything remaining is provably occluded
    # (bit-identical).  Round-4 TPU A/B (prof_trace vs no_early_z, bench
    # scene ~32k tris): the per-group lax.cond made every kernel SLOWER
    # (main raster 5.68 -> 3.24 ms off, depth rasters 1.01 -> 0.63) and
    # the suffix-bound prep cost ~1.9 ms XLA-side -> default OFF.  Keep
    # selectable for deep-bin content (stress scene) where skips can
    # dominate; bin_zub band bounds make the prep ~free there.
    raster_early_z: bool = False
    # none|nearest_half|nearest|bilinear: legacy 256^2 pool paths;
    # mip|mip_half: texture system v2 — native-size mip chains with
    # combined albedo+surface+normal quad rows (one gather per sample,
    # render/texturepool.py); mip_half samples at half resolution
    texture_filter: str = "nearest"
    matmap_max_size: int = 256       # material-map entry resolution cap
    use_shade_kernel: bool = True    # deferred-shade Pallas megakernel
                                     # (requires use_pallas + mip filter)
    # run every Pallas kernel in interpret mode — lets the FULL fast
    # path (megakernel + fused raster) execute on CPU for golden-image
    # tests; never set on TPU
    pallas_interpret: bool = False
    enable_skinning: bool = False    # dual-quat skinned vertex path
    enable_foliage: bool = False     # per-draw wind bend vertex modifier
    # terrain LOD geomorph vertex modifier (push_terrain draws lerp
    # toward baked coarse-grid targets by camera distance; reference
    # data/terrain.geometry.vert) — costs one extra row gather per vertex
    enable_terrain_morph: bool = False
    max_palettes: int = 16
    max_bones: int = 128
    max_particle_quads: int = 0      # forward OIT billboard capacity
    max_translucent_draws: int = 0   # translucent meshes via OIT
    max_translucent_tris: int = 4096
    # full deferred shade on the nearest translucent layer (megakernel
    # path only; reference translucent.frag clustered-forward parity)
    translucent_lit: bool = True
    # depth-peeled lit layers (1..4, shade_pallas.MAX_TR_LAYERS): every
    # peeled layer gets the FULL deferred shade, nearest first; only
    # fragments beyond the LAST peeled layer blend unlit via WBOIT
    # (reference shades every fragment, renderer.cpp:6596-6684 — 4
    # peels cover any realistic translucent overlap)
    translucent_lit_layers: int = 1
    # shade the lit translucent layer at 1/N resolution (glass/water is
    # smooth; its raster + plane assembly + second megakernel shrink by
    # ~N^2) and composite via matmul-resampled planes.  1 = full res.
    translucent_lit_scale: int = 1
    max_dynamic_vertices: int = 0    # per-frame vertex override slab (ocean)
    backface_cull: bool = True       # cull camera-facing-away triangles
    use_light_clusters: bool = False  # per-tile light lists vs dense loop
    max_spot_shadows: int = 0        # spot lights with shadow maps
    spot_shadow_res: int = 256
    # 'parabolic' (reference map_parabolic — any cone angle) on the
    # pallas path, or 'perspective' (cone angle <= ~160 deg)
    spot_shadow_mode: str = "parabolic"
    max_decals_active: int = 0       # dense decal blend loop capacity
    # decal albedo/normal texture taps (reduced-res gathers) on the
    # megakernel path; False = flat-color decals only (zero gathers)
    decal_textures: bool = True
    max_fog_planes: int = 0          # analytic half-space fog planes
    # device sprite/overlay pass capacity (reference: OVERLAY pass
    # sprites, renderer.cpp:6760-6789): each instance alpha-blends a
    # fixed overlay_region^2 window of the display image in draw order
    # (ops/sprite_pass.py); 0 = host compositor only
    max_overlay_sprites: int = 0
    overlay_region: int = 128
    enable_depth_of_field: bool = False
    enable_color_grading: bool = True
    enable_ssao: bool = False        # HBAO pass
    # AO buffer resolution relative to the fbo — matches the reference's
    # RenderParams::ssaoscale (ssaobuffer = fbo*ssaoscale,
    # renderer.cpp:5841; 0 disables, :6558).  Static here because buffer
    # shapes are compiled; the reference likewise rebuilds its context
    # when it changes (renderer.cpp:5621).
    ssao_scale: float = 0.5
    # temporal AO reprojection (reference: hbao.comp:156-162 prevmap):
    # Context threads last frame's decimated AO stack + view matrix back
    # into hbao() as `prev`.  Static-camera frames are unchanged (the
    # temporal lerp converges to the current AO); moving cameras get
    # history-stabilised AO.  Off by default: single-frame renders
    # (goldens/bench) never benefit and it adds one gather at AO res.
    ssao_temporal: bool = False
    enable_ssr: bool = False         # screen-space reflections
    ssr_mode: str = "binned"         # 'binned' quarter-res gather-free
                                     # march (ops/ssr2.py) or 'dda'
    enable_bloom: bool = True        # dense conv chain - cheap
    enable_fog: bool = False
    fog_depth_range: float = FOG_DEPTH_RANGE
    # screen-space fog tap stride: the 160x90 froxel grid spans ~12 px
    # per cell at 1080p, so an 8x tap still Nyquist-covers it — and the
    # gather is per-lookup bound (PERF.md lesson 1): 4->8 cuts the tap
    # from ~3.5 ms to ~0.9 ms at 1080p
    fog_sample_scale: int = 4
    # per-tile capacity for the forward/OIT rasters (particles +
    # translucent meshes) — far fewer triangles than the opaque pass, so
    # walking the opaque-sized bins wasted row DMA on every tile
    forward_bin_capacity: int = 64
    forward_big_capacity: int = 16

    def __post_init__(self):
        if self.bin_capacity is None:
            # ~128K (tile, tri) pairs total: bins-gather cost stays flat
            # across resolutions; deep bins where tiles are few
            cap = max(131072 // max(self.n_tiles, 1), 64)
            cap = min(round_up(cap, 8), round_up(self.max_triangles, 8))
            object.__setattr__(self, "bin_capacity", cap)

    @property
    def padded_width(self) -> int:
        return round_up(self.width, TILE_W)

    @property
    def padded_height(self) -> int:
        return round_up(self.height, TILE_H)

    @property
    def tiles_x(self) -> int:
        return self.padded_width // TILE_W

    @property
    def tiles_y(self) -> int:
        return self.padded_height // TILE_H

    @property
    def n_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


def ndc_grid(height: int, width: int, dtype=jnp.float32):
    """Per-pixel NDC coordinates at pixel centers, row 0 = top.

    Matches the Vulkan-style viewport the reference renders with
    (Y-flipped projection, reference: src/renderer/camera.cpp:81-85):
    NDC (-1,-1) is the top-left pixel corner.
    """
    ys = (jnp.arange(height, dtype=dtype) + 0.5) / height * 2.0 - 1.0
    xs = (jnp.arange(width, dtype=dtype) + 0.5) / width * 2.0 - 1.0
    return jnp.meshgrid(ys, xs, indexing="ij")


def srgb_encode(linear):
    """Piecewise sRGB transfer (final image encode)."""
    linear = jnp.clip(linear, 0.0, 1.0)
    return jnp.where(
        linear <= 0.0031308,
        linear * 12.92,
        1.055 * jnp.power(jnp.maximum(linear, 1e-8), 1 / 2.4) - 0.055,
    )


def np_f32(x):
    return np.asarray(x, np.float32)
