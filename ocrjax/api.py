"""Public API: detect / recognize / ocr (SURVEY.md §2.1 R9, §2.3 N9).

Mirrors the reference's surface — `detect(path) -> boxes`,
`recognize(path) -> string`, `ocr(path) -> ordered text` — plus batched
variants (C4) and tiled high-res documents (C5). An `OcrEngine` owns the
models, weights, charset and the jit caches; module-level functions wrap a
default engine for one-liner use.

TPU structure: each stage is one fused jit program keyed by a static bucket
shape (SURVEY.md §3.6) — e.g. recognition is normalize → CRNN fwd → batched
greedy/beam CTC in a single XLA graph, with host work limited to image decode
and the final id→char lookup.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ocrjax import preprocess
from ocrjax.charset import Charset, default_charset
from ocrjax.config import OcrConfig
from ocrjax.models.crnn import create_crnn
from ocrjax.ops import ctc

ImageLike = preprocess.ImageLike


@dataclasses.dataclass
class RecResult:
    """One recognized text line."""
    text: str
    confidence: float
    # True when rec_try_flip chose the 180°-rotated reading of the strip
    flipped: bool = False


@dataclasses.dataclass
class DetBox:
    """One detected text region: 4 corner points (x, y) in original image
    coordinates, clockwise from top-left, plus the mean prob-map score."""
    quad: np.ndarray  # (4, 2) float32
    score: float


@dataclasses.dataclass
class OcrLine:
    box: DetBox
    text: str
    confidence: float


@dataclasses.dataclass
class OcrResult:
    lines: List[OcrLine]
    # True when the fused path's static per-page line capacity was saturated
    # — the page may hold MORE lines than returned (callers can redo on the
    # unbounded staged path; api_det.ocr does this automatically)
    truncated: bool = False

    @property
    def text(self) -> str:
        return "\n".join(l.text for l in self.lines)


class OcrEngine:
    """Owns config, charset, model defs, weights and jit caches."""

    def __init__(
        self,
        config: Optional[OcrConfig] = None,
        charset: Optional[Charset] = None,
        rec_variables=None,
        det_variables=None,
        cls_variables=None,
        seed: int = 0,
        tile_det_variables=None,
        tile_det_arch=None,
    ):
        self.config = config or OcrConfig()
        self.charset = charset or default_charset()
        self.rec_model = create_crnn(self.config, self.charset.num_classes)
        key = jax.random.PRNGKey(seed)
        if rec_variables is None:
            # Random init — usable for shape/pipeline tests; real weights come
            # from training (ocrjax.train) or converted checkpoints (weights).
            dummy = jnp.zeros(
                (1, self.config.rec_height, self.config.rec_width_buckets[0], 1),
                jnp.float32,
            )
            rec_variables = self.rec_model.init(key, dummy)
        self.rec_variables = rec_variables
        self.det_variables = det_variables
        # orientation classifier (rec_try_flip): tiny, always constructed;
        # trained weights come from assets/cls.safetensors (from_pretrained)
        from ocrjax.models.cls import create_cls
        self.cls_model = create_cls(self.config)
        self._cls_trained = cls_variables is not None
        # set by from_pretrained when the cls asset carries the antisym
        # certificate — enables single-pass margins (cfg.cls_single_pass)
        self.cls_antisym = False
        if cls_variables is None:
            cls_variables = self.cls_model.init(
                key,
                jnp.zeros((1, self.config.rec_height,
                           self.config.rec_width_buckets[0], 1), jnp.float32),
                jnp.full((1,), self.config.rec_width_buckets[0], jnp.int32))
        self.cls_variables = cls_variables
        self._det = None  # built lazily by detection methods (ocrjax.models.db)
        # dedicated cheap tile-scale detector (VERDICT r4 next #1): loaded
        # from assets/det_tile.safetensors when present; tiling._tile_forward
        # routes C5 tile detection through it (cfg.tile_det_enable)
        self.tile_det_variables = tile_det_variables
        self.tile_det_arch = tile_det_arch

    def warn_untrained_cls(self):
        """One-time warning when rec_try_flip runs on a RANDOM-INIT
        orientation classifier (no cls checkpoint was loaded): flip
        decisions would be arbitrary. Called by the dispatch paths."""
        if self._cls_trained or getattr(self, "_cls_warned", False):
            return
        self._cls_warned = True
        from ocrjax.utils.logging import get_logger, log_fields
        log_fields(get_logger("ocrjax.api"), "warning",
                   "rec_try_flip is enabled but no trained orientation "
                   "classifier was loaded (assets/cls.safetensors) — flip "
                   "decisions come from a random-init net",
                   trained=False)

    # ------------------------------------------------------------------
    # Recognition (C1 single / C4 batched)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self", "beam"))
    def _rec_step(self, variables, batch_u8, widths, beam: bool = False):
        """One fused XLA program: normalize → CRNN → batched CTC decode."""
        x = preprocess.rec_normalize(
            batch_u8, self.config.rec_mean, self.config.rec_std)
        from ocrjax.ops.warp import maybe_dewarp_curl
        x = maybe_dewarp_curl(x[..., 0], widths, self.config)[..., None]
        logits, frame_lengths = self.rec_model.apply(variables, x, widths)
        decode = ctc.ctc_beam_decode if beam else ctc.ctc_greedy_decode
        kw = dict(blank=self.config.ctc_blank,
                  max_tokens=self.config.rec_max_tokens)
        if beam:
            kw["beam_width"] = self.config.ctc_beam_width
        return decode(logits, frame_lengths, **kw)

    @functools.partial(jax.jit, static_argnames=("self", "beam"))
    def _rec_step_flip(self, variables, cls_variables, batch_u8, widths,
                       seg_ids, beam: bool = False):
        """_rec_step with the orientation-classifier stage in front: each
        strip is classified and conditionally rotated 180° on device before
        the CRNN (api_det._cls_flip_strips; seg_ids groups page-mates for
        the orientation prior). cls_variables are traced like the rec
        variables so weight swaps take effect without retracing. Returns
        (tokens, n_tokens, conf, flipped)."""
        from ocrjax.api_det import _cls_flip_strips
        from ocrjax.ops.warp import maybe_dewarp_curl
        x = preprocess.rec_normalize(
            batch_u8, self.config.rec_mean, self.config.rec_std)
        strips, flipped = _cls_flip_strips(
            self, cls_variables,
            maybe_dewarp_curl(x[..., 0], widths, self.config),
            widths, seg_ids)
        logits, frame_lengths = self.rec_model.apply(
            variables, strips[..., None], widths)
        decode = ctc.ctc_beam_decode if beam else ctc.ctc_greedy_decode
        kw = dict(blank=self.config.ctc_blank,
                  max_tokens=self.config.rec_max_tokens)
        if beam:
            kw["beam_width"] = self.config.ctc_beam_width
        tokens, n_tokens, conf = decode(logits, frame_lengths, **kw)
        return tokens, n_tokens, conf, flipped

    def recognize_strips(
        self, strips: Sequence[np.ndarray], beam: bool = False,
        same_page: bool = False, prior_ids: Sequence[int] = None,
    ) -> List[RecResult]:
        """Batched recognition of pre-cropped uint8 grayscale line strips.

        Strips may have arbitrary sizes; they are resized to the rec height
        on host and bucketed by width (one XLA program per (count, width)
        bucket, SURVEY.md §2.3 N13). same_page=True tells rec_try_flip's
        orientation stage that the strips come from ONE page (the page-
        level prior then pools their margins — api_det._cls_flip_strips);
        unrelated strips keep independent per-line decisions. prior_ids
        (len(strips) ints) generalizes same_page to MULTI-page pools:
        strips sharing an id share one orientation-prior group (the
        batched downscaled-page redo lane pools several pages' full-res
        crops into one dispatch — api_det.ocr_fullres_batch).
        """
        if len(strips) == 0:
            return []
        resized = [
            preprocess.rec_resize(preprocess.to_gray(np.asarray(s)),
                                  self.config.rec_height)
            for s in strips
        ]
        n = len(strips)
        try_flip = self.config.rec_try_flip
        batch, widths = preprocess.pad_strips_to_bucket(resized, self.config)
        rows = len(resized)
        nb = self.config.line_bucket_for_count(rows)
        if nb > rows:  # pad the batch axis to the count bucket
            pad = np.zeros((nb - rows,) + batch.shape[1:], batch.dtype)
            batch = np.concatenate([batch, pad], axis=0)
            widths = np.concatenate(
                [widths, np.full((nb - rows,), batch.shape[2], np.int32)])
        if try_flip:
            self.warn_untrained_cls()
            # size from the ACTUAL batch rows — when n exceeds the largest
            # count bucket, line_bucket_for_count clamps and nb < n
            total = batch.shape[0]
            if prior_ids is not None:  # per-page groups; pads vote alone
                # COMPACT to dense [0, n): apply_page_prior's segment
                # scatter/gather requires dense ids — raw caller ids can
                # exceed the padded batch size (e.g. ocr_fullres_batch row
                # indices after rot90/empty pages drop out), which would
                # silently zero the prior for those pages
                base = np.unique(np.asarray(prior_ids, np.int64),
                                 return_inverse=True)[1].astype(np.int32)
                seg = np.concatenate(
                    [base, base.max(initial=0) + 1
                     + np.arange(total - n, dtype=np.int32)])
            elif same_page:  # real rows share group 0; pad rows vote alone
                seg = np.concatenate(
                    [np.zeros(n, np.int32), np.arange(1, total - n + 1)])
            else:
                seg = np.arange(total)
            out = self._rec_step_flip(
                self.rec_variables, self.cls_variables, jnp.asarray(batch),
                jnp.asarray(widths), jnp.asarray(seg, jnp.int32), beam=beam)
            tokens, n_tokens, conf, win = map(np.asarray, out)
        else:
            out = self._rec_step(self.rec_variables, jnp.asarray(batch),
                                 jnp.asarray(widths), beam=beam)
            tokens, n_tokens, conf = map(np.asarray, out)
            win = np.zeros((n,), bool)
        return [
            RecResult(self.charset.decode(tokens[i][: n_tokens[i]]),
                      float(conf[i]), flipped=bool(win[i]))
            for i in range(n)
        ]

    def recognize(self, image: ImageLike, beam: bool = False) -> RecResult:
        """C1: single pre-cropped text-line image → one string."""
        img = preprocess.load_image(
            image, auto_invert=self.config.auto_invert)
        return self.recognize_strips([img], beam=beam)[0]

    # ------------------------------------------------------------------
    # Detection / end-to-end — implemented with the DB stage (see
    # ocrjax.models.db, ocrjax.postprocess); wired in api_det.py mixin style.
    # ------------------------------------------------------------------

    def detect(self, image: ImageLike) -> List[DetBox]:
        from ocrjax import api_det  # local import to keep C1 path light
        return api_det.detect(self, image)

    def ocr(self, image: ImageLike, beam: bool = False) -> OcrResult:
        from ocrjax import api_det
        return api_det.ocr(self, image, beam=beam)

    def ocr_batch(self, images: Sequence[ImageLike], beam: bool = False,
                  fused: bool = False) -> List[OcrResult]:
        """C4 batched OCR. fused=True runs the single-XLA-program path
        (ocrjax.fused): zero intermediate host syncs, fixed per-page line
        capacity; greedy or on-device beam decode."""
        if fused:
            from ocrjax import fused as F
            return F.ocr_pages_fused(self, images, beam=beam)
        from ocrjax import api_det
        return api_det.ocr_batch(self, images, beam=beam)

    def detect_tiled(self, image: ImageLike) -> List[DetBox]:
        from ocrjax import api_det
        return api_det.detect_tiled(self, image)

    def ocr_tiled(self, image: ImageLike, beam: bool = False) -> OcrResult:
        """C5 end-to-end: tiled detection at tile_size px + pooled
        ink-refined recognition from the tiles (BASELINE.json:11)."""
        from ocrjax import tiling
        return tiling.ocr_tiled(self, image, beam=beam)

    def ocr_tiled_batch(self, images: Sequence[ImageLike],
                        beam: bool = False) -> List[OcrResult]:
        """Multi-page C5 driver: pipelined tile detection + cross-page
        pooled recognition, with per-page error isolation
        (tiling.ocr_tiled_batch)."""
        from ocrjax import tiling
        return tiling.ocr_tiled_batch(self, images, beam=beam)


# ---------------------------------------------------------------------------
# Module-level convenience (default engine, built on first use)
# ---------------------------------------------------------------------------

_default_engine: Optional[OcrEngine] = None


def get_default_engine() -> OcrEngine:
    global _default_engine
    if _default_engine is None:
        _default_engine = OcrEngine.from_pretrained()
    return _default_engine


def recognize(image: ImageLike, beam: bool = False) -> RecResult:
    return get_default_engine().recognize(image, beam=beam)


def detect(image: ImageLike) -> List[DetBox]:
    return get_default_engine().detect(image)


def ocr(image: ImageLike, beam: bool = False) -> OcrResult:
    return get_default_engine().ocr(image, beam=beam)


def _from_pretrained(cls, path: str = None, config: OcrConfig = None,
                     seed: int = 0) -> "OcrEngine":
    """Load an engine from a weights directory (assets/ by default).

    Expects `<dir>/rec.safetensors` (+ optional `det.safetensors`,
    `rec.charset.txt`). Missing files → random init for that stage.
    """
    import os
    from ocrjax import weights as W

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "assets")
    rec_p = os.path.join(path, "rec.safetensors")
    det_p = os.path.join(path, "det.safetensors")
    cls_p = os.path.join(path, "cls.safetensors")
    tdet_p = os.path.join(path, "det_tile.safetensors")
    cs_p = os.path.join(path, "rec.charset.txt")
    charset = Charset.from_file(cs_p) if os.path.exists(cs_p) else None
    rec_v = W.load_variables(rec_p) if os.path.exists(rec_p) else None
    det_v = W.load_variables(det_p) if os.path.exists(det_p) else None
    cls_v = W.load_variables(cls_p) if os.path.exists(cls_p) else None
    cls_antisym = (os.path.exists(cls_p)
                   and W.load_metadata(cls_p).get("antisym") == "1")
    tdet_v = tdet_arch = None
    if os.path.exists(tdet_p):
        import json as _json
        tdet_v = W.load_variables(tdet_p)
        tdet_meta = W.load_metadata(tdet_p)
        # the tile asset's metadata carries its OWN architecture only —
        # it never feeds the engine-level OcrConfig
        tdet_arch = _json.loads(tdet_meta.get("arch", "{}")) or None
    if config is None:
        import json
        cfg_dict = {}
        if os.path.exists(rec_p):
            meta = W.load_metadata(rec_p)
            if "config" in meta:
                cfg_dict.update(json.loads(meta["config"]))
        if os.path.exists(det_p):
            # det-side structural fields (e.g. det_head_stride) ride the det
            # file's metadata so the right model is built for the weights
            meta = W.load_metadata(det_p)
            if "config" in meta:
                cfg_dict.update(json.loads(meta["config"]))
        if cfg_dict:
            cfg_dict = {k: tuple(v) if isinstance(v, list) else v
                        for k, v in cfg_dict.items()}
            config = OcrConfig(**cfg_dict)
    eng = cls(config=config, charset=charset, rec_variables=rec_v,
              det_variables=det_v, cls_variables=cls_v, seed=seed,
              tile_det_variables=tdet_v, tile_det_arch=tdet_arch)
    eng.cls_antisym = cls_antisym
    return eng


OcrEngine.from_pretrained = classmethod(_from_pretrained)
