"""Configuration dataclasses.

The reference hardcodes all of its constants (SURVEY.md section 4: frustum
min-z 0.2 at splat/utils.py:294, EWA clamp 1.3*tan(fov) at utils.py:336-342,
det clamp 1e-3 at utils.py:387, 3-sigma radius at utils.py:421, tile size 16,
T-thresholds 1e-6 / 1e-3). Here every knob is an explicit, hashable config so
it can be closed over by ``jax.jit`` as a static argument.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class CompatConfig:
    """Flags reproducing reference quirks (SURVEY.md section 4 "Quirks").

    The defaults are the *correct* behaviors; flipping the flags reproduces
    the reference implementation bit-for-bit where tests demand it.
    """

    # Reference CPU path applies sigmoid twice to the opacity logit
    # (splat/gaussian_scene.py:143 and :164); the CUDA path applies it once.
    double_sigmoid: bool = False
    # Reference CPU path skips the last partial tile row/column
    # (range(0, dim - tile_size, tile_size), splat/gaussian_scene.py:208,214).
    skip_last_tile: bool = False
    # Reference tile-overlap test is inclusive of [min, min + tile_size]
    # (splat/gaussian_scene.py:209-218), i.e. a bbox touching the first pixel
    # of the *next* tile is still binned into this tile.
    inclusive_tile_overlap: bool = False
    # Reference per-pixel path additionally rejects pixels outside the
    # gaussian's own bbox only at tile granularity; the CUDA path rejects at
    # pixel granularity (render.cu:55-60). The pixel-level bbox test changes
    # the image, so it is a flag.
    pixel_bbox_test: bool = False

    REFERENCE_CPU = None  # filled in below
    REFERENCE_CUDA = None


CompatConfig.REFERENCE_CPU = CompatConfig(
    double_sigmoid=True,
    skip_last_tile=True,
    inclusive_tile_overlap=True,
    pixel_bbox_test=False,
)
CompatConfig.REFERENCE_CUDA = CompatConfig(
    double_sigmoid=False,
    skip_last_tile=False,
    inclusive_tile_overlap=True,
    pixel_bbox_test=True,
)


@dataclasses.dataclass(frozen=True)
class RasterizerConfig:
    """Static knobs for the projection + binning + compositing pipeline."""

    tile_size: int = 16           # pixels per tile side (ref: gaussian_scene.py:200)
    # Pairs streamed per VMEM chunk in the Pallas rasterizer. Chunks are
    # lane windows of the feature-major record stream, so this must be a
    # multiple of the 128-lane f32 tile. Larger values amortize loop/DMA
    # overhead; smaller values waste less on short tile groups.
    chunk_size: int = 128
    # Consecutive tiles rasterized per grid step. The sequential Mosaic
    # grid has per-step overhead (~1 us), so groups keep the step count
    # ~1k/frame; larger groups also grow the one-hot accumulation matmuls
    # ((group_tiles, chunk) @ (chunk, tile_size^2) per payload channel).
    group_tiles: int = 64
    # Transmittance early-exit threshold. Reference: 1e-6 (Python,
    # gaussian_scene.py:153), 1e-3 (CUDA, render.cu:73). We default between.
    t_threshold: float = 1e-4
    # Per-gaussian alpha clamp; reference CUDA clamps at 0.99 (render.cu:71).
    alpha_clamp: float = 0.99
    # Skip contributions with alpha below this (standard 3DGS uses 1/255;
    # the reference uses 0.0 -- keep 0.0 for parity tests).
    alpha_min: float = 0.0
    # Frustum near-plane cull (ref: utils.py:294).
    frustum_min_z: float = 0.2
    # EWA xy clamp factor (ref: utils.py:336-342).
    ewa_clamp: float = 1.3
    # 2D covariance determinant clamp (ref: utils.py:387).
    det_clamp: float = 1e-3
    # Eigenvalue discriminant floor in the radius computation (ref: utils.py:414).
    eig_floor: float = 0.1
    # Screen-space radius multiplier in sigmas (ref: utils.py:421 uses 3.0).
    radius_sigmas: float = 3.0
    # Low-pass dilation added to the 2D covariance diagonal. The reference
    # omits it; the original 3DGS paper uses 0.3 to guarantee every splat
    # covers at least ~a pixel. Keep 0.0 for reference parity.
    cov2d_dilation: float = 0.0
    # Static capacity of the (tile, gaussian) pair buffer, as a multiple of
    # the number of gaussians. Overflowing gaussians are dropped far-to-near
    # (whole gaussians, so per-tile ranges stay exact).
    pairs_per_gaussian: int = 4
    # Cap on the number of tiles a single gaussian may span per axis.
    max_span: int = 32
    # MXU precision of the kernels' one-hot accumulation matmuls.
    # "highest" = exact f32 (Mosaic runs it as 6 bf16 passes). "split3"
    # hand-decomposes the f32 payload into three bf16 terms (the one-hot
    # selector is exact in bf16) for 3 single-pass matmuls, exact to ~1 f32
    # ulp -- but MEASURED SLOWER than "highest" on v5e (probe_split3.py:
    # 9.98 vs 9.41 ms fwd+bwd at treehill ref-init; the VPU hi/mid/lo
    # extraction costs more than the saved passes, and a 1-pass "default"
    # run shows the matmuls are only ~0.6 ms of the kernel anyway).
    # "default" = 1 raw bf16 pass (~4e-3 relative, fails the 1e-4 parity
    # gates; throughput experiments only). For dense pair streams, shrink
    # ``group_tiles`` instead: the matmul cost scales linearly with it.
    accum_precision: str = "highest"
    # Tile groups processed per sequential Mosaic grid step. Each grid step
    # costs ~3 us of dispatch overhead; at treehill scale (~1k groups of 64
    # tiles) that is ~3 ms -- most of the bare kernel time. Batching
    # amortizes it without touching the one-hot matmul shapes (whose cost
    # scales with group_tiles, NOT with this). The group count is padded to
    # a whole number of steps (padded groups are empty; binning keys them
    # past the sentinel).
    groups_per_step: int = 4
    compat: CompatConfig = dataclasses.field(default_factory=CompatConfig)

    def __post_init__(self):
        assert self.tile_size > 0 and self.chunk_size > 0
        assert self.chunk_size % 128 == 0, \
            "chunk_size must be a multiple of the 128-lane f32 tile"
        assert (self.tile_size ** 2) % 128 == 0, \
            "tile_size^2 must fill whole 128-lane vector registers"
        assert self.group_tiles > 0
        assert self.alpha_clamp <= 0.9999, \
            "alpha must stay < 1 so transmittance is monotone"
        assert self.accum_precision in ("split3", "highest", "default")
        assert self.groups_per_step >= 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """3DGS optimization hyperparameters (the reference has no training loop;
    values follow the original 3DGS paper / gsplat defaults)."""

    iterations: int = 7000
    lr_means: float = 1.6e-4        # scaled by scene extent
    lr_means_final: float = 1.6e-6
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_opacity: float = 5e-2
    lr_sh0: float = 2.5e-3
    lr_shN: float = 2.5e-3 / 20.0
    ssim_weight: float = 0.2        # loss = (1-w)*L1 + w*(1-SSIM)
    # Single-chip loss path when ssim_weight > 0: True runs the fused
    # tile-space L1+SSIM value+gradient band kernel
    # (ops/fused_loss_pallas.py -- one pass, no tile<->image relayouts in
    # HBM); False keeps the split path (tile L1 + untile + SSIM fwd/bwd),
    # which remains the parity oracle.
    fused_loss: bool = True
    sh_degree: int = 3
    sh_degree_interval: int = 1000  # raise active SH degree every N steps
    # Densification
    densify_start: int = 500
    densify_stop: int = 15000
    densify_interval: int = 100
    densify_grad_threshold: float = 2e-4
    densify_scale_threshold: float = 0.01  # x scene extent: split vs clone
    prune_opacity_threshold: float = 5e-3
    opacity_reset_interval: int = 3000
    capacity_multiplier: float = 4.0  # fixed pool = multiplier * init count
    # Multi-camera batch DP (single-chip): each optimizer step averages
    # gradients over this many same-resolution cameras, rendered in one
    # on-device lax.scan (train_step_batched) -- amortizes per-step host
    # dispatch and fills idle chip time at small scenes. 1 = classic 3DGS
    # one-camera steps.
    camera_batch: int = 1
    seed: int = 0
    # Failure recovery: save the full training state (model + optimizer
    # moments + step) every N steps so a preempted/failed run resumes from
    # the last checkpoint (gstpu train --resume); 0 = save at end only
    checkpoint_every: int = 0
    checkpoint_keep: int = 3        # retain the newest N periodic ckpts
