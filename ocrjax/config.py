"""Frozen configuration for the OCR pipeline.

The reference keeps its hyperparameters as CLI flags + hardcoded constants
(SURVEY.md §5 "Config / flag system"). Here everything lives in one frozen
dataclass so that jit-compiled functions can close over static values and the
CLI maps 1:1 onto fields. Defaults are the standard DB/CRNN values named in
SURVEY.md §5 (thresh 0.3, box_thresh 0.6, unclip 1.5, max_side 960,
rec height 32) — to be re-verified against the real reference source when the
mount is fixed (SURVEY.md §0).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class OcrConfig:
    # --- detection preprocess (SURVEY.md §2.1 R1) ---
    det_max_side: int = 960          # max long side before detection
    det_stride: int = 32             # H, W padded to multiples of this
    det_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    det_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)

    auto_invert: bool = True         # polarity canonicalization at decode:
                                     # a light-ink-on-dark page (median
                                     # subsampled luma < 128 — text pages
                                     # are mostly background, so the median
                                     # tracks the background shade) is
                                     # inverted before ANY processing. The
                                     # whole stack — synth training data,
                                     # DB shrink targets, ink-band refine —
                                     # assumes dark ink on light paper;
                                     # quad coordinates are unaffected by
                                     # inversion, so this is a pure input
                                     # transform (preprocess.load_image)

    det_head_stride: int = 1         # det prob-map stride vs the canvas: 4
                                     # detects on the FPN's native S/4 grid
                                     # (cuts the head's learned upsampling —
                                     # ~11 ms of a 31 ms forward); box coords
                                     # scale back to canvas px in
                                     # extract_boxes and the ink refinement
                                     # recovers exact geometry at full res

    det_int8: bool = False           # int8 conv path for the DB backbone +
                                     # FPN (models.db_int8): BN-folded,
                                     # per-channel weights, dynamic per-image
                                     # activation scales, int32 accumulate —
                                     # v5e MXU int8 is ~2x bf16. Head stays
                                     # float. Off until the TPU benchmark
                                     # (scripts/bench_int8_det.py) records
                                     # the speed/quality trade.

    # --- DB postprocess (SURVEY.md §2.1 R3) ---
    det_thresh: float = 0.3          # prob-map binarization threshold
    det_box_thresh: float = 0.6      # mean-score filter for candidate boxes
    det_unclip_ratio: float = 1.5    # Vatti-style polygon expansion ratio
    det_max_candidates: int = 256    # fixed-shape cap on boxes per page
    det_min_box_size: int = 3        # minimum side length in pixels
    det_cc_iters: int = 4            # CCL row/col-scan alternations: each
                                     # sweep has whole-run reach, so this is
                                     # the component "bend count" (text
                                     # blobs converge in 2-3)
    det_cc_downsample: int = 4       # CCL on an OR-pooled coarse grid (16x
                                     # less scan traffic); components closer
                                     # than this many px may merge (e2e
                                     # quality measured identical at 960px)

    # --- recognition preprocess (SURVEY.md §2.1 R1) ---
    rec_height: int = 32             # fixed input height of line crops
    rec_width_buckets: Tuple[int, ...] = (64, 128, 192, 256, 320, 512)
    rec_mean: float = 0.5
    rec_std: float = 0.5

    # --- CRNN / CTC (SURVEY.md §2.1 R5, R6) ---
    rec_snap_to_ink: bool = True     # re-crop warped strips to their ink
                                     # band on device (canonicalizes det-box
                                     # margin noise before recognition)
    rec_crop_margin: float = 0.15    # pre-snap quad expansion, fraction of
                                     # line height on every side (recovers
                                     # glyphs the detector's box clipped)
    rec_flat_band_frac: float = 0.46  # flat-band (x-height-aware) rescale:
                                     # when a strip's ink band has a FLAT
                                     # top and bottom profile (no ascender/
                                     # descender structure — 1-3 glyph
                                     # strips of uniform-height glyphs,
                                     # the measured dominant error class),
                                     # the refined crop is expanded so the
                                     # band renders at this fraction of
                                     # the strip height instead of full
                                     # height. Training strips render ink
                                     # centered at font-proportional size
                                     # (x-height ≈ 0.40·H, caps ≈ 0.52·H,
                                     # full lines ≈ 0.72·H — synth.render_
                                     # line), so the full-height rescale
                                     # is out-of-distribution for flat
                                     # bands and erases the x-height size
                                     # cue (x→X, DESIGN.md §4e). 0.46
                                     # lands both glyph classes near their
                                     # training sizes; the shipped rec
                                     # soup is fine-tuned on this geometry
                                     # (--flat-snap, DESIGN.md §4f:
                                     # len-1/2 exact 0.603/0.817 →
                                     # 0.714/0.917). 0 disables.
    rec_ink_x_margin_keep: float = 0.5  # fraction of the x expansion margin
                                     # the ink-band refine may absorb: <1
                                     # rejects side-neighbor ink leaking in
                                     # as phantom edge characters while
                                     # still recovering clipped slivers
    rec_try_flip: bool = False       # 180° handling: the orientation
                                     # classifier (models/cls, the PP-OCR
                                     # "cls" stage) runs inside the rec
                                     # program, rotating upside-down strips
                                     # on device before the CRNN. Pages
                                     # whose lines mostly flip also get
                                     # their reading order reversed.
                                     # STAYS default OFF (r5): the MXU
                                     # flip cut the fused overhead 31% →
                                     # 2.3% and straight pages are
                                     # quality-neutral, but a default-ON
                                     # trial FAILED the TPU gates on
                                     # short-line content — 1-glyph
                                     # strips are intrinsically 180°-
                                     # ambiguous and whole-page-ambiguous
                                     # workloads (len-1 pages 0.62 →
                                     # 0.02; dense 0.955 → 0.845 exact)
                                     # coin-flip without an upright
                                     # majority for the page prior to
                                     # pool. Opt-in per call/CLI for
                                     # mixed-orientation corpora, which
                                     # now costs ~2% instead of 31%.
    rot90_tilt_deg: float = 60.0     # with rec_try_flip on, a page whose
                                     # detected boxes' MEDIAN tilt exceeds
                                     # this reads as rotated ±90° (landscape
                                     # scan): the page redoes rotated 90°
                                     # ccw and the line-level cls resolves
                                     # the remaining 180° ambiguity. 0
                                     # disables the reroute.
    cls_page_prior: float = 2.0      # weight of the page-level orientation
                                     # prior (width-weighted mean margin of
                                     # the page's lines) added to each
                                     # line's own cls margin: pages are
                                     # almost never mixed-orientation, so
                                     # short ambiguous lines borrow the
                                     # page's decision; strong per-line
                                     # evidence still overrides. 0 = pure
                                     # per-line decisions.
    rec_flat_case_gate: bool = False  # case-aware condition on the
                                     # flat-band rescale (utils.flatband
                                     # FLAT_CASE_MAX_FRAC): only bands at
                                     # x-height scale vs the detector box
                                     # rescale. MEASURED OFF with the r5
                                     # soup: straight 8-seed identical
                                     # (0.9703) gated or not, and the
                                     # gate costs 2 len-1 lines on
                                     # eval_xheight (the r5 candidate's
                                     # case-gated flat-snap training
                                     # already absorbed the caps-drift
                                     # the gate was built against).
    rec_dewarp_curl: bool = False    # curved-baseline rectification
                                     # (ops.warp.dewarp_curl): fit a
                                     # quadratic through each strip's
                                     # column ink centers and remove the
                                     # bow with a piecewise-linear MXU
                                     # shift. Identity (bit-exact) for
                                     # strips below the deviation floor.
                                     # DEFAULT OFF: unit-level it fixes
                                     # bowed strips (6/24, breaks 0) but
                                     # the e2e severity-1.0 measurement
                                     # read worse ON than OFF — see
                                     # DESIGN.md §4j for the verdict.
    rec_dewarp_min_dev_px: float = 3.0  # fitted peak-to-peak deviation
                                     # (strip px) below which a strip is
                                     # flat and keeps its pixels
    rec_dewarp_max_px: float = 10.0  # displacement clamp (strip px)
    cls_single_pass: bool = True     # orientation margin from ONE
                                     # classifier pass (2·logit(s)) when
                                     # the loaded cls asset was trained
                                     # with the antisymmetry penalty
                                     # (cls_trainer antisym>0, asset
                                     # metadata antisym=1); assets without
                                     # the certificate keep the two-pass
                                     # symmetric ensemble regardless.
    rec_hidden: int = 256            # BiLSTM hidden size
    rec_conv_channels: Tuple[int, ...] = (64, 128, 256, 512)
    ctc_blank: int = 0               # blank id (charset ids start at 1)
    ctc_beam_width: int = 8
    rec_max_tokens: int = 128        # fixed-shape decode output length

    # --- batching / tiling (C4, C5; SURVEY.md §2.3 N12/N13) ---
    line_batch_buckets: Tuple[int, ...] = (8, 16, 32, 64, 128, 256)
    fused_lines_per_page: int = 32   # static per-page line capacity of the
                                     # fused e2e program (size to workload)
    ocr_single_fused: bool = True    # route single-page ocr() (greedy AND
                                     # beam) through the fused program (one
                                     # dispatch + one fetch); False restores
                                     # the staged path with exact homography
                                     # rectification
    fused_rotation_reroute_deg: float = 3.0  # pages whose detected boxes
                                     # tilt beyond this re-run through the
                                     # staged exact-homography path (the
                                     # fused program's separable warp crops
                                     # rotated lines by their AABB: measured
                                     # 0.80 vs 0.93 line-exact at ±10°).
                                     # 0 disables rerouting.
    fused_reroute_min_aspect: float = 1.7  # only boxes at least this
                                     # elongated (long/short side) can
                                     # trigger the rotation reroute: a
                                     # near-square box's PCA tilt is
                                     # eigenvalue noise (measured: 17% of
                                     # STRAIGHT pages tripped the reroute,
                                     # every offender aspect <= 1.5), and
                                     # an AABB crop of a near-square line
                                     # barely differs from its homography
                                     # crop — the ink refinement re-derives
                                     # the extents either way.
    fused_reroute_noise_px: float = 6.0  # prob-map extent wobble (px at
                                     # canvas scale) assumed when judging a
                                     # SINGLE box's tilt: a box of long side
                                     # L only triggers the reroute alone if
                                     # its tilt clears atan(noise_px/L) —
                                     # measured on the bench mix: straight
                                     # 54-94 px boxes read up to 4.05° of
                                     # pure PCA noise while every >100 px
                                     # box reads <=1.5°. Coherent page
                                     # rotation is caught separately by the
                                     # elongated-box median. 0 disables the
                                     # floor (pure threshold).
    fused_color_reroute_frac: float = 0.005  # pages where more than this
                                     # fraction of pixels carry strong
                                     # chroma reroute to the staged path
                                     # computed over MIN-CHANNEL luma
                                     # (colored ink stays dark there; 601
                                     # luma can wash it out entirely).
                                     # 0 disables.
    pooled_sep_warp: bool = True     # pooled/bucketed recognition warps
                                     # near-axis-aligned quads through the
                                     # separable MXU warp (two matmuls per
                                     # strip off a dynamic row tile —
                                     # ops/warp.warp_quads_multi_separable)
                                     # instead of the 41k-point gather warp
                                     # (measured ~800 ms device time per
                                     # 96-page window, 93% of the bucketed
                                     # path's dominant stage). A quad stays
                                     # on the exact homography warp when its
                                     # tilt clears the same per-box
                                     # noise-aware threshold the fused
                                     # reroute uses, or when it is taller
                                     # than pooled_sep_tile_h. False = all
                                     # quads homography-warped (pre-r3
                                     # behavior).
    pooled_sep_tile_h: int = 128     # row-tile height of the separable
                                     # pooled warp; quads whose expanded
                                     # AABB is taller route to homography
    fused_chunk_pages: int = 16      # pages per fused-program call; large
                                     # batches are cut into chunks dispatched
                                     # ahead so upload/compute/download of
                                     # neighboring chunks overlap on the
                                     # host-device link
    tile_size: int = 2048            # C5: tiled detection at 2048px
    tile_overlap: int = 128
    tile_merge_iou: float = 0.3
    tile_pipeline_tiles: int = 4     # target tiles per C5 window when a
                                     # batch spans multiple pages: smaller
                                     # windows mean the double-buffered
                                     # window loop overlaps window k+1's
                                     # tile detection with window k's
                                     # pooled recognition (device never
                                     # idles between phases), at the cost
                                     # of pooling fewer pages' crops into
                                     # shared buckets. The HBM cap below
                                     # still bounds the window; a single
                                     # page with more tiles than this is
                                     # its own window. 0 = fill windows to
                                     # the HBM cap (pre-r4 behavior).
    tile_window_hbm_mb: int = 1536   # HBM budget (MB) for ONE pooled C5
                                     # window's live tiles; the window tile
                                     # cap is derived from this and the
                                     # per-tile footprint (normalized f32
                                     # copy + packed upload + det-forward
                                     # transient — see tiling.max_pool_
                                     # tiles). Two windows are live at once
                                     # under detection double-buffering, so
                                     # size this at ≤ half the HBM you can
                                     # spare beyond params + rec pools.
    tile_det_enable: bool = True     # use the dedicated cheap tile-scale
                                     # detector (assets/det_tile.safetensors,
                                     # ~5x fewer FLOPs than the flagship DB
                                     # — the top compute sink of a dense C5
                                     # page, DESIGN.md §6c) for tiled
                                     # detection when its asset is loaded.
                                     # False = tiles run the flagship det
                                     # (pre-r5 behavior / A-B testing).
    tile_blank_skip: bool = True     # host prescreen: drop tiles with no
                                     # stroke-level contrast (max-min < 24
                                     # luma levels) before upload — blank
                                     # area of sparse high-res documents
                                     # skips the link AND the det forward.
                                     # Conservative by construction: any
                                     # tile containing visible ink has far
                                     # more contrast, and degraded scans'
                                     # sensor noise alone exceeds it (such
                                     # pages simply keep all tiles).
    tile_max_candidates: int = 384   # per-TILE candidate cap for the C5
                                     # path: a dense 2048px tile holds 250+
                                     # short lines (BASELINE.json:11
                                     # "hundreds of lines/page"), where the
                                     # 960px-sized det_max_candidates would
                                     # silently drop raster-late lines.
                                     # A tile whose valid count REACHES the
                                     # cap marks the page truncated
                                     # (OcrResult.truncated) — the recorded
                                     # semantics for pages beyond capacity

    # --- runtime ---
    compute_dtype: str = "bfloat16"  # MXU-native dtype for conv/matmul
    param_dtype: str = "float32"
    upload_bits: int = 4             # luma canvas link transport: 4 = packed
                                     # nibbles (half the upload bytes —
                                     # congested-tunnel throughput doubles;
                                     # 16 gray levels measured quality-
                                     # neutral on the e2e gates), 8 = raw u8
    fetch_bytes: bool = True         # downlink transport: pack rec/fused
                                     # payloads as uint8 on device (token-id
                                     # columns are small ints; float columns
                                     # are BITCAST, not quantized — values
                                     # identical, ~3-4x fewer fetch bytes).
                                     # False = legacy all-float32 payloads
    fetch_max_tokens: int = 48       # truncated-first-fetch of token columns:
                                     # pull only the first N of rec_max_tokens
                                     # token columns per line (tokens past
                                     # n_tokens are padding, and real lines
                                     # rarely exceed ~40 chars) and refetch
                                     # the full on-device payload ONLY when a
                                     # line's n_tokens exceeds N — bit-exact
                                     # always, ~2.5x fewer fused-payload
                                     # bytes. 0 = always fetch all columns
    det_fetch_candidates: int = 64   # truncated-first-fetch of detection
                                     # candidate slots: extract_boxes fills
                                     # slots in ascending raster root order
                                     # (components form a PREFIX), so pulling
                                     # the first N of det_max_candidates
                                     # slots + the per-page highest-used-slot
                                     # scalar is exact whenever the page used
                                     # ≤ N slots; denser pages refetch the
                                     # full buffer (kept on device). ~4x
                                     # fewer det downlink bytes on typical
                                     # pages. 0 = always fetch all slots

    def replace(self, **kw) -> "OcrConfig":
        return dataclasses.replace(self, **kw)

    def rec_bucket_for_width(self, w: int) -> int:
        """Smallest configured width bucket >= w (last bucket if wider)."""
        for b in self.rec_width_buckets:
            if w <= b:
                return b
        return self.rec_width_buckets[-1]

    def line_bucket_for_count(self, n: int) -> int:
        """Smallest configured line-count bucket >= n (last if larger)."""
        for b in self.line_batch_buckets:
            if n <= b:
                return b
        return self.line_batch_buckets[-1]


# A small config for unit tests / CPU: tiny model dims, short buckets.
TINY = OcrConfig(
    det_max_side=256,
    rec_hidden=48,
    rec_conv_channels=(16, 32, 48, 64),
    rec_width_buckets=(64, 128),
    line_batch_buckets=(4, 8),
    det_max_candidates=64,
    tile_size=256,
    tile_overlap=32,
    tile_max_candidates=64,
    compute_dtype="float32",
)
