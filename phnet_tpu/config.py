"""Configuration for the PHNet-TPU framework.

The reference (CZY-Code/PHNet) uses executable python option files loaded through
an mmcv-style ``Config.fromfile`` (reference ``libs/utils/config.py``,
``options/optionsV3.py``, ``options/options4OL.py``, ``options/options4OLV3.py``).
We replace that with plain frozen dataclasses: every knob of the reference's
active option files maps onto a field here, and the two dataset presets
(:func:`vil100_config`, :func:`openlane_config`) reproduce the reference's
active configurations.

Design note (TPU-first): all quantities that shape traced computations
(``num_priors``, ``n_offsets``, ``max_lanes``, ``memory_window`` …) are static
python ints living in hashable frozen dataclasses, so they can be closed over
by ``jax.jit`` without retracing hazards.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple, Union


@dataclass(frozen=True)
class LaneSpec:
    """Layout of the per-anchor lane vector.

    The reference uses two layouts:

    * VIL-100 (``RouterV4.py:172-214``, ``transformV4.py:183-216``):
      ``[2 cls, start_y, start_x, theta, valid_len, invalid_len, n_offsets xs]``
    * OpenLane-V (``Router4OL.py:153-168``, ``openlane/transforms.py:251-305``):
      ``[2 cls, start_y, start_x, theta, length, n_offsets xs]``

    We unify them: 5 fixed header fields + ``n_lengths`` length fields +
    ``n_offsets`` sample-row x coordinates.
    """

    n_offsets: int = 36
    n_lengths: int = 2  # 2 = VIL (valid+invalid), 1 = OpenLane

    @property
    def n_strips(self) -> int:
        return self.n_offsets - 1

    @property
    def header_dim(self) -> int:
        # 2 cls logits + start_y + start_x + theta + lengths
        return 5 + self.n_lengths

    @property
    def dim(self) -> int:
        return self.header_dim + self.n_offsets

    # Column indices -------------------------------------------------------
    @property
    def col_start_y(self) -> int:
        return 2

    @property
    def col_start_x(self) -> int:
        return 3

    @property
    def col_theta(self) -> int:
        return 4

    @property
    def col_length(self) -> int:
        """Valid length (VIL) / length (OL)."""
        return 5

    @property
    def col_invalid_length(self) -> Optional[int]:
        return 6 if self.n_lengths == 2 else None

    @property
    def col_xs(self) -> int:
        return self.header_dim


@dataclass(frozen=True)
class BackboneConfig:
    """Backbone: ResNet (reference ``libs/models/resnet.py:148-319``) or
    RevCol (``revcolV2.py``, selected via ``cfg.backbone == 'revcol'``)."""

    kind: str = "resnet"  # "resnet" | "revcol"
    depth: int = 18
    in_channels: Tuple[int, ...] = (64, 128, 256, 512)
    norm: str = "batch"  # "batch" (SyncBN via axis_name) or "group"
    # stem formulation: "conv7" = the reference's 7x7/s2 conv on 3 input
    # channels; "space_to_depth" = the SAME function (exact, same params,
    # checkpoint-compatible) computed as a 4x4/s1 conv on a 2x2
    # space-to-depth input — 3-channel convs waste the 128-wide MXU, the
    # SD form feeds it 12 channels (the MLPerf ResNet TPU trick);
    # "width_packed" = the zero-copy half of the same trick (7x4/s(2,1)
    # conv on a free-reshape [B,H,W/2,6] input — the full SD transpose
    # cost ~0.93 ms/tick of thin-channel layout copies at serving B=8).
    # "auto" (default) = width_packed on TPU, conv7 elsewhere: B=8
    # serving A/B (2026-08-21) width_packed 1097.4 agg fps vs s2d 1061.7
    # vs conv7 999.4 — s2d's fuller 12-lane packing loses its edge to
    # ~0.93 ms/tick of thin-channel transpose copies, which width_packed
    # avoids entirely; CPU keeps conv7 so torch-parity tests compare the
    # reference formulation bit-for-bit.
    stem: str = "auto"
    # backward formulation for the stem max-pool: "scatter" = XLA's
    # default select-and-scatter (~4.7 ms of the B=4 train step,
    # profiles/train_b4_2026-08-20.txt); "onehot" = the custom
    # equality-routed VJP in ops/pool.py (static strided slices +
    # interior-padded adds). MEASURED NEGATIVE on v5e (2026-08-21, B=4
    # unroll=1 train_bench A/B): onehot 171.6 fps vs scatter 216.1 —
    # the nine input-resolution padded accumulations cost ~80 ms/step,
    # far more than the 4.7 ms they replace; select-and-scatter is
    # already near its ~1.5 GB/step bandwidth bound here. Kept behind
    # the flag (grad-exact vs scatter on unique maxima, tested).
    pool_vjp: str = "scatter"
    # which of the four stage outputs feed the neck; the reference FPN drops
    # leading levels when given fewer in_channels (fpn.py:113-116)
    out_indices: Tuple[int, ...] = (1, 2, 3)
    # revcol_tiny defaults (revcolV2.py:203-208)
    revcol_layers: Tuple[int, ...] = (2, 2, 4, 2)
    revcol_num_subnet: int = 4
    revcol_drop_path: float = 0.1
    revcol_save_memory: bool = True


@dataclass(frozen=True)
class NeckConfig:
    """FPN neck (reference ``libs/models/fpn.py``, ``options*.py`` ``neck=``).

    ``out_channels`` may be a per-level tuple (the multi-scale variant's
    ``fpnV2``)."""

    in_channels: Tuple[int, ...] = (128, 256, 512)
    out_channels: Union[int, Tuple[int, ...]] = 64
    num_outs: int = 3


@dataclass(frozen=True)
class HeadConfig:
    """Dual-branch anchor head (reference ``RouterV4.py:34-133`` /
    ``Router4OL.py:33-120``)."""

    num_priors: int = 240
    sample_points: int = 36
    refine_layers: int = 3
    fc_hidden_dim: int = 64
    num_fc: int = 2
    prior_feat_channels: int = 64
    # second branch transformer (RouterV4.py:103-109)
    decoder_layers: int = 2
    decoder_heads: int = 8
    decoder_ffn_dim: int = 256
    decoder_dropout: float = 0.1
    # positional encoding for the second branch: "sine" (VIL,
    # RouterV4.py:110-111) or "learned" (OL, Router4OL.py:110)
    pos_encoding: str = "sine"
    pos_temperature: float = 16.0
    pos_normalize: bool = True
    # OL predicts offsets with a separate per-offset head (Router4OL.py:78-83);
    # VIL folds them into the reg head output (RouterV4.py:80)
    separate_offset_head: bool = False
    # router (Router.py:39-81)
    router_reduction: int = 4
    router_blocks: int = 4
    # run the router's residual conv chain in the fused Pallas kernel
    # (ops/router_pallas.py) instead of XLA's fusion. Measured: XLA wins
    # at B=1 (58us vs 107-114us/call — Pallas fixed costs dominate at
    # [240, 64, 36]); at large serving batches the XLA chain's f32
    # [B*A, C, P] intermediates outgrow VMEM and go superlinear
    # (B=8->16: 1.07 -> 5.92 ms/tick, xplane 2026-08-19), where the
    # anchor-tiled kernel's fixed VMEM footprint should win — flag for
    # per-deployment A/B.
    router_pallas: bool = False
    # serve the router chain with bf16 intermediates at fusion boundaries
    # (inference only — training keeps the parity-exact f32 chain); the
    # HBM/VMEM-footprint lever for the same large-batch spill. None = auto:
    # StreamingServer enables it when max_streams exceeds the measured B=8
    # VMEM spill point (serving sweep 2026-08-19: +13% at B=16, -7% at
    # B=8); everywhere else None behaves as False. Set True/False to pin.
    router_chain_bf16: Optional[bool] = None
    # force the router conv chain to f32 in TRAINING even when
    # compute_dtype is bf16 — the A/B switch for the round-4 decision to
    # let the training chain follow the mixed-precision policy (a
    # deliberate numerics divergence from the reference's always-f32
    # chain, guarded by the held-out generalization gates). Pin True to
    # recover the parity-exact training chain on a real-dataset run.
    router_train_chain_f32: bool = False
    # router chain layout: "plane" = [T, C, P] (P=36 pads to 128 lanes,
    # 28% utilization); "flat" = [T, C*P] (2304 = 18 exact lane tiles;
    # the 3x3 becomes nine masked flat shifts). MEASURED NEGATIVE on v5e
    # (2026-08-21): train B=4 190.8 vs 216.1 clip-fps, serving B=8 641
    # vs 1097 agg fps — the +-1/+-35/+-37 flat shifts cross lane-tile
    # boundaries (the same failure mode as the Pallas lane-roll kernel,
    # ops/router_pallas.py), costing far more than the planar padding
    # waste they remove. Kept behind the flag, equality-tested.
    router_chain_impl: str = "plane"
    # DynamicConv (dynamic_head.py:6-59)
    dyn_dim_factor: int = 2  # dim_dynamic = inplanes * factor
    dyn_param_reduction: int = 8  # hidden of the weight-generator MLPs
    dyn_out_expand: int = 6  # out_layer hidden = hidden_dim * expand
    # head variant: "single" (RouterV4/Router4OL) or "multi" scale
    # (Router4OLV2: per-stage sample points / channels)
    variant: str = "single"
    # Router4OLV3 cross-frame prior propagation: frame t-1's kept lanes
    # return as K extra anchor rows decoded by dedicated "_last" heads
    # (Router4OLV3.py:294-367); implies a one-frame memory window and the
    # per-row MLP router (AdaptiveRouter4LaneV3)
    propagate_priors: bool = False
    ms_sample_points: Tuple[int, ...] = (24, 48, 96)
    ms_channels: Tuple[int, ...] = (64, 32, 16)
    # evaluate the first refine stage's frame-local chain (pool -> router
    # -> DynamicConv -> first branch) batched over ALL clip frames OUTSIDE
    # the temporal scan: stage 0 sees only fixed priors + the frame's FPN
    # level (no memory), so hoisting reads its weights once per clip
    # instead of once per frame. MEASURED NEGATIVE on the v5e (2026-08-19,
    # bench device_frame_ms 1.018 -> 1.327 ms/frame, train 157 -> 149
    # clip-fps): inside the scan the per-frame [A, C*2C] generated-weight
    # and pooling intermediates fit in VMEM and XLA fuses them (no HBM
    # round trip), while the hoisted batched form must stream [T*A, C*2C]
    # intermediates through HBM — costing more than the ~27 MB/frame of
    # stage-0 weight re-reads it saves. Default off; kept because the
    # equality is tested (tests/test_model.py hoist tests) and larger
    # models (where weights outgrow intermediates) may want it.
    stage0_hoist: bool = False
    # compute BOTH branch head-MLP stacks as one [2, n, ...] batched
    # einsum chain per stage (zero-padded to the wider sec trunk —
    # exact, padded channels are structural zeros): halves the
    # per-stage head-GEMM dispatch count in the latency-bound serving
    # tick. Measured B=8 (s2d-packed, 2026-08-21): 1168.0 -> 1199.0 agg
    # fps. Default on; hoisted stage-0 keeps the separate path.
    dual_branch_heads: bool = True

    @property
    def attn_dim(self) -> int:
        """Width of the memorized second-branch features: 2*hidden for the
        concat pos-encoding (single scale), hidden for additive (multi)."""
        return self.fc_hidden_dim if self.variant == "multi" else 2 * self.fc_hidden_dim


@dataclass(frozen=True)
class TestParams:
    """Inference thresholds (reference ``options*.py`` ``test_parameters``)."""

    __test__ = False  # not a pytest class

    conf_threshold: float = 0.6
    nms_thres: float = 50.0
    nms_topk: int = 8


@dataclass(frozen=True)
class MemoryConfig:
    """Temporal memory of positive-lane features.

    The reference keeps, per frame and per refine stage, the features of
    matched/kept anchors plus one mean-negative feature
    (``RouterV4.py:517-538``). VIL keeps every past frame
    (``RouterV4.py:504-510``); OL keeps a bounded window of
    ``save_freq_max`` frames (``Router4OL.py:555-556``).

    TPU-native design: a fixed-shape ring buffer
    ``[stages, window, max_lanes + 1, 2*hidden]`` with a validity mask,
    carried through ``lax.scan``. ``window <= 0`` means "unbounded": the
    caller sizes the buffer to the clip length.
    """

    window: int = 5  # <=0: sized to clip length (VIL behaviour)
    slots_per_frame: int = 9  # max_lanes + 1 (mean negative)


@dataclass(frozen=True)
class ModelConfig:
    img_h: int = 384
    img_w: int = 768
    lane: LaneSpec = field(default_factory=LaneSpec)
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    neck: NeckConfig = field(default_factory=NeckConfig)
    head: HeadConfig = field(default_factory=HeadConfig)
    memory: MemoryConfig = field(default_factory=MemoryConfig)
    test: TestParams = field(default_factory=TestParams)
    max_lanes: int = 8
    # inference routing: "hard" = where(diff>=0.5, sec, fir) (RouterV4.py:500),
    # "soft" = diff*sec + (1-diff)*fir (Router4OL.py:541)
    routing: str = "hard"
    # original-image geometry used when decoding to full-resolution lanes
    cut_scale: float = 0.35  # VIL: crop top cut_scale*H (dataV3.py:154)
    crop_size: int = 0  # OL: fixed 480 px sky crop (datasetOL.py:47-58)
    org_size: Optional[Tuple[int, int]] = None  # OL fixed (1280, 1920)
    # compute dtype for backbone/head matmuls ("bfloat16" or "float32")
    compute_dtype: str = "float32"
    # inference-only quantization of the DynamicConv generator chains (the
    # detect scan's FLOPs + weight-bytes bulk); see ops/quant.py:
    #   "int8" — w8a8 dynamic int8 on the MXU's double-rate s8 path
    #   "w8"   — weight-only int8, dequantized in-register into the bf16
    #            dot (halves the scan's HBM weight reads, no activation
    #            quantization; the lever for the weight-BW-bound B=1 scan)
    quantize: str = "none"
    # NMS implementation: "auto" (pallas on TPU, pure-jax elsewhere),
    # "pallas", or "jax"
    nms_backend: str = "auto"
    # training label assigner, run inside the frame scan:
    #   "hungarian" — batched JV solve == scipy linear_sum_assignment,
    #                 the reference's shipped path (dynamic_assign.py:190)
    #   "dynamic_k" — SimOTA over the same costs (the reference's own
    #                 in-tree alternative, dynamic_assign.py:83-125),
    #                 reduced to one-prior-per-target; replaces the JV
    #                 augmenting-path while-loop with top-k + fori_loop
    train_assigner: str = "hungarian"
    # serving-internal frame ingestion layout (StreamingServer sets this
    # on ITS model copy; parameter shapes are unchanged, so weights are
    # interchangeable with the unpacked model):
    #   "none"  — frames arrive [B, T, H, W, C]
    #   "width" — [B, T, H, W/2, 2C] for the width_packed stem (host
    #             packs with a zero-cost numpy reshape; the in-graph
    #             reshape is a tiled-layout copy, 0.42 ms of the B=8
    #             tick — measured a wash once removed, the relayout
    #             moves into the conv)
    #   "s2d"   — [B, T, H/2, W/2, 4C] full space-to-depth, emitted by
    #             the data loader/decode (a real host-side transpose,
    #             but the C++ clip loader writes pixels anyway); the
    #             device then runs the clean 4x4/s1 conv with 12
    #             contraction channels and NO transpose at all
    packed_frames: str = "none"
    # unroll factor of the temporal scan (trades compile time for loop
    # overhead; 1 = plain lax.scan)
    scan_unroll: int = 1
    # rematerialize the per-frame step in the backward pass: activations of
    # each scanned frame are recomputed instead of stored, trading ~1 extra
    # forward for O(T) less HBM traffic through the temporal scan
    remat_frames: bool = True
    # what the remat saves: "full" recomputes everything (max memory
    # saving); "dots" saves plain matmul/conv outputs but NOT the batched
    # per-anchor einsums (jax's dots_with_no_batch_dims_saveable — the
    # DynamicConv bmms and attention contractions are recomputed);
    # "alldots" saves every MXU contraction including the batched ones
    # (dots_saveable) and recomputes only the elementwise chain. Measured
    # on the 16-frame clip step "dots" vs "full" is ~1.5%; see ROADMAP
    # round-4 for the alldots/off sweep.
    remat_policy: str = "dots"

    @property
    def n_offsets(self) -> int:
        return self.lane.n_offsets

    @property
    def n_strips(self) -> int:
        return self.lane.n_strips


@dataclass(frozen=True)
class LossConfig:
    """Criterion weights (reference ``optionsV3.py:108-110``,
    ``options4OL.py:64-66``, ``lossV5.py:71-207``, ``loss4OLV3.py:12-123``)."""

    cls_weight: float = 2.5
    reg_weight: float = 0.5
    iou_weight: float = 2.0
    focal_alpha: Tuple[float, float] = (0.5, 0.5)
    focal_gamma: float = 2.0
    iou_length: float = 15.0  # +/- band in px (dynamic_assign.py:5)
    # "blend_all" = VIL: router blends full per-anchor loss (lossV5.py:194-208)
    # "blend_cls" = OL: router blends cls loss only; reg/iou of both branches
    #               are summed (loss4OLV3.py:104-123)
    style: str = "blend_all"
    # OL uses the CLRerNet width-adaptive LaneIoULoss (loss4OLV3.py:28),
    # constructed with its DEFAULT geometry img_h=400, img_w=960
    # (dynamic_assignV2.py:56) — not the model's image size
    use_lane_iou: bool = False
    lane_iou_width: float = 7.5 / 768.0
    lane_iou_img_h: int = 400
    lane_iou_img_w: int = 960
    # NOTE: the training assigner is selected by ``ModelConfig.
    # train_assigner`` (the assignment runs inside the model's frame scan,
    # which only sees ModelConfig); the criterion's no-precomputed-matches
    # fallback always uses Hungarian.


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 50
    train_batch: int = 1
    sampled_frames: int = 16
    learning_rate: float = 5e-4
    solver: str = "adamw"  # "sgd" | "adamw"
    momentum: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 1e-3
    max_skip: int = 5
    skip_increment: int = 5
    max_training_skip: int = 100
    epochs_per_increment: int = 2
    samples_per_video: int = 2
    epoch_per_test: int = 5
    seed: int = 3407
    grad_clip_norm: float = 0.0  # 0 = off (reference has it commented out)
    # run the AdamW update on one flat [m,1024] matrix (train/
    # optimizer.py fused_adamw) instead of per-leaf optax fusions:
    # identical math (torch-trajectory-parity-tested), ~1400 fewer
    # dispatches/step, grad_norm computed as one fused reduce. Measured
    # a speed WASH at B=1/B=4 on v5e (214.0 vs 215.6 clip-fps — the
    # top-level tiny-op soup was mostly BN reduces, not the optimizer),
    # kept on for the dispatch hygiene. NOTE: the optimizer state
    # layout differs from optax's — set False to resume a checkpoint
    # written with the optax layout (rounds <= 4).
    fused_optimizer: bool = True
    accum_steps: int = 1  # micro-batches per optimizer update (see step.py)
    checkpoint_dir: str = "models"
    loss: LossConfig = field(default_factory=LossConfig)


@dataclass(frozen=True)
class DataConfig:
    root: str = "./dataset"
    dataset: str = "VIL100"
    img_h: int = 384
    img_w: int = 768
    cut_scale: float = 0.35
    crop_size: int = 0
    max_lanes: int = 8
    normalize_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    normalize_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)


def vil100_config(**overrides) -> Config:
    """Active VIL-100 configuration (reference ``options/optionsV3.py``)."""
    model = ModelConfig(
        lane=LaneSpec(n_offsets=36, n_lengths=2),
        backbone=BackboneConfig(),
        neck=NeckConfig(in_channels=(128, 256, 512), out_channels=64, num_outs=3),
        head=HeadConfig(pos_encoding="sine", separate_offset_head=False),
        memory=MemoryConfig(window=0, slots_per_frame=9),  # unbounded (VIL)
        test=TestParams(conf_threshold=0.6, nms_thres=50.0, nms_topk=8),
        max_lanes=8,
        routing="hard",
        cut_scale=0.35,
    )
    train = TrainConfig(
        epochs=50,
        learning_rate=5e-4,
        weight_decay=1e-3,
        epochs_per_increment=2,
        loss=LossConfig(
            cls_weight=2.5, reg_weight=0.5, iou_weight=2.0,
            focal_alpha=(0.5, 0.5), style="blend_all",
        ),
    )
    data = DataConfig(dataset="VIL100", cut_scale=0.35, max_lanes=8)
    cfg = Config(model=model, train=train, data=data)
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def openlane_config(n_offsets: int = 72, **overrides) -> Config:
    """Active OpenLane-V configuration (reference ``options/options4OL.py`` with
    the testOLV3 72-offset variant from ``options/options4OLV3.py``).

    ``n_offsets`` is config-driven in the reference too (``num_points``:
    36 in options4OL.py, 72 in options4OLV3.py).
    """
    model = ModelConfig(
        lane=LaneSpec(n_offsets=n_offsets, n_lengths=1),
        backbone=BackboneConfig(),
        neck=NeckConfig(in_channels=(128, 256, 512), out_channels=64, num_outs=3),
        head=HeadConfig(pos_encoding="learned", separate_offset_head=True),
        memory=MemoryConfig(window=5, slots_per_frame=5),  # max_lanes(4)+1
        test=TestParams(conf_threshold=0.5, nms_thres=50.0, nms_topk=4),
        max_lanes=4,
        routing="soft",
        cut_scale=0.0,
        crop_size=480,
        org_size=(1280, 1920),
    )
    train = TrainConfig(
        epochs=50,
        learning_rate=5e-4,
        weight_decay=5e-4,
        epochs_per_increment=15,
        max_skip=1,
        skip_increment=1,
        samples_per_video=1,
        loss=LossConfig(
            cls_weight=8.0, reg_weight=0.5, iou_weight=1.5,
            focal_alpha=(0.1, 0.9), style="blend_cls", use_lane_iou=True,
        ),
    )
    data = DataConfig(dataset="OpenLane", cut_scale=0.0, crop_size=480, max_lanes=4)
    cfg = Config(model=model, train=train, data=data)
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def openlane_multiscale_config(n_offsets: int = 72, **overrides) -> Config:
    """Multi-scale OpenLane-V configuration (reference ``Router4OLV2`` used
    by ``testOLV3.py``/``trainOLV3.py`` with ``options/options4OLV3.py``):
    neck levels (64,128,256)->(16,32,64), per-stage sample points
    [24,48,96] over channels [64,32,16], 256-wide decode/decoder, hard
    routing at inference."""
    base = openlane_config(n_offsets=n_offsets)
    model = dataclasses.replace(
        base.model,
        backbone=BackboneConfig(out_indices=(0, 1, 2)),
        neck=NeckConfig(in_channels=(64, 128, 256), out_channels=(16, 32, 64),
                        num_outs=3),
        head=HeadConfig(
            variant="multi",
            fc_hidden_dim=256,
            decoder_ffn_dim=512,
            pos_encoding="sine",
            pos_temperature=64.0,
            pos_normalize=False,
            separate_offset_head=False,
            ms_sample_points=(24, 48, 96),
            ms_channels=(64, 32, 16),
        ),
        routing="hard",
    )
    cfg = dataclasses.replace(base, model=model)
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def openlane_propagate_config(n_offsets: int = 72, **overrides) -> Config:
    """Cross-frame prior-propagation OpenLane-V configuration (reference
    ``Router4OLV3.py`` ``DetNetV3``/``RouterOL``): the OL preset with K =
    ``max_lanes`` propagated prior slots, dedicated "_last" heads, the
    per-row MLP router, a one-frame memory window, and no mean-negative
    memory row (``saveMemory``, ``Router4OLV3.py:729-741``)."""
    base = openlane_config(n_offsets=n_offsets)
    model = dataclasses.replace(
        base.model,
        head=dataclasses.replace(base.model.head, propagate_priors=True),
        # shape-consistent propagation needs exactly one frame of memory
        # (memoryCont must row-align with priors_last, Router4OLV3.py:341)
        memory=MemoryConfig(window=1, slots_per_frame=4),  # max_lanes, no neg
    )
    cfg = dataclasses.replace(base, model=model)
    return dataclasses.replace(cfg, **overrides) if overrides else cfg
