"""rec_try_flip: 180° (upside-down) text handling.

The PP-OCR lineage runs a separate direction-classifier stage between crop
and recognition; the TPU-native equivalent here (ocrjax.models.cls) runs
INSIDE the recognition XLA program: a tiny CNN classifies every rectified
strip (symmetric ensemble over the strip and its rotation), the flips
happen as a device gather, then the normal CRNN+CTC decode runs — no extra
host round trips. Pages whose lines mostly flip read in reversed order.

Decode-confidence comparison does NOT work for this model family and is
deliberately not used: the CRNN is trained on random glyph strings, so a
flipped strip decodes to other glyphs with equally high confidence
(measured: neither mean, min, geometric-mean nor low-quantile frame
probability separated orientations on the refined-warp path).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ocrjax.config import TINY
from ocrjax.train import synth


@pytest.fixture(scope="module")
def engine():
    # the NO-FLIP reference: rec_try_flip defaults ON since r5, so the
    # negative-control fixture disables it explicitly
    from ocrjax.api import OcrEngine
    eng = OcrEngine.from_pretrained()
    eng.config = eng.config.replace(rec_try_flip=False)
    return eng


@pytest.fixture(scope="module")
def flip_engine():
    # separate engine instance: config is frozen, jit caches key on config
    from ocrjax.api import OcrEngine
    eng = OcrEngine.from_pretrained()
    eng.config = eng.config.replace(rec_try_flip=True)
    return eng


def _rot180_quads(quads):
    """Corner relabeling for a 180°-rotated reading of the same region
    (TL↔BR, TR↔BL). Test-only: production flips post-warp via
    models.cls.flip_strips_by_width; this identity documents why the two
    are equivalent."""
    return quads[..., [2, 3, 0, 1], :]


def test_rot180_quads_warp_parity():
    """Warping with the relabeled corners yields the 180°-rotated strip
    (the geometric identity behind reading a quad upside down)."""
    from ocrjax.ops.warp import warp_quads

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(64, 96).astype(np.float32))
    q = np.asarray([[[10.0, 12.0], [80.0, 14.0],
                     [81.0, 34.0], [11.0, 32.0]]], np.float32)
    s_up, w_up = warp_quads(img, jnp.asarray(q),
                            rec_height=16, bucket_width=64)
    s_fl, w_fl = warp_quads(img, jnp.asarray(_rot180_quads(q)),
                            rec_height=16, bucket_width=64)
    assert int(w_up[0]) == int(w_fl[0])
    w = int(w_up[0])
    a = np.asarray(s_up)[0, :, :w]
    b = np.asarray(s_fl)[0, :, :w][::-1, ::-1]
    # bilinear sampling grids of the two readings coincide up to the
    # half-pixel grid reflection — agree to a small tolerance
    assert np.abs(a - b).mean() < 0.05, np.abs(a - b).mean()


def test_flip_strips_by_width_matches_host():
    """Device 180° strip rotation == host rotation of the valid region."""
    from ocrjax.models.cls import flip_strips_by_width

    rng = np.random.RandomState(1)
    strips = rng.rand(4, 8, 32).astype(np.float32)
    widths = np.asarray([32, 20, 7, 1], np.int32)
    pad = -1.0
    for i in range(4):
        strips[i, :, widths[i]:] = pad
    flip = np.asarray([True, True, False, True])
    out = np.asarray(flip_strips_by_width(
        jnp.asarray(strips), jnp.asarray(widths), jnp.asarray(flip), pad))
    for i in range(4):
        w = widths[i]
        want = strips[i].copy()
        if flip[i]:
            want[:, :w] = strips[i, :, :w][::-1, ::-1]
        np.testing.assert_allclose(out[i], want, atol=0)


def test_apply_page_prior_math():
    from ocrjax.api_det import apply_page_prior

    margin = jnp.asarray([-4.0, -4.0, 1.0,   6.0, -1.0])
    widths = jnp.asarray([100, 100, 100, 100, 100], jnp.int32)
    seg = jnp.asarray([0, 0, 0, 3, 4], jnp.int32)
    out = np.asarray(apply_page_prior(margin, widths, seg, 2.0))
    # group 0 mean = -7/3: the weak +1 outlier is pulled below zero...
    assert out[2] < 0
    # ...while strong evidence in a solo group is amplified, not flipped
    assert out[3] > 0 and out[4] < 0
    # one STRONG vote against weak page-mates carries the page (margins are
    # log-odds: |6| ≫ |−1| means the confident line is the evidence)
    m2 = jnp.asarray([-1.0, -1.0, 6.0])
    s2 = jnp.asarray([0, 0, 0], jnp.int32)
    w2 = jnp.asarray([100, 100, 100], jnp.int32)
    out2 = np.asarray(apply_page_prior(m2, w2, s2, 2.0))
    assert (out2 > 0).all(), out2
    # a VERY confident flipped outlier among confident upright mates still
    # flips alone (rotated stamp) — it must out-evidence α× the page mean
    m3 = jnp.asarray([-8.0, -8.0, 12.0])
    out3 = np.asarray(apply_page_prior(m3, w2, s2, 2.0))
    assert out3[2] > 0 and out3[0] < 0 and out3[1] < 0, out3
    # ...and symmetrically, VERY confident upright mates cannot un-flip a
    # confidently-flipped outlier: the consensus is built from CLIPPED
    # margins, so one ±20-class line counts like a ±8 one
    m4 = jnp.asarray([-23.0, -12.0, 12.7])
    out4 = np.asarray(apply_page_prior(m4, w2, s2, 2.0))
    assert out4[2] > 0 and out4[0] < 0 and out4[1] < 0, out4


def test_cls_trainer_smoke():
    """Trainer mechanics on a few steps (accuracy is asserted by the asset
    gate below, not here)."""
    from ocrjax.train.cls_trainer import train_cls
    r = train_cls(config=TINY, steps=3, batch_size=8, widths=(64,),
                  eval_batches=1, log_every=2)
    assert "params" in r.variables
    assert 0.0 <= r.accuracy <= 1.0


def _cls_accuracy(flip_engine, p_word, min_chars, n=96, width=192,
                  seed=7):
    from ocrjax import preprocess
    from ocrjax.api_det import _cls_flip_strips
    from ocrjax.train.cls_trainer import flip_half, snap_rows_to_ink

    cfg = flip_engine.config
    rng = np.random.RandomState(seed)
    hits = total = 0
    while total < n:
        lb = synth.make_line_batch(rng, flip_engine.charset, 64, width,
                                   height=cfg.rec_height, p_word=p_word,
                                   p_space=0.2, noise=0.02,
                                   max_len=max(4, width // 12))
        keep = [i for i, t in enumerate(lb.texts)
                if len(t.replace(" ", "")) >= min_chars]
        snap_rows_to_ink(rng, lb)  # serving geometry (ink-refined warp)
        labels = flip_half(rng, lb)
        x = preprocess.rec_normalize(jnp.asarray(lb.images),
                                     cfg.rec_mean, cfg.rec_std)[..., 0]
        _, flipped = _cls_flip_strips(flip_engine,
                                      flip_engine.cls_variables, x,
                                      jnp.asarray(lb.widths))
        pred = np.asarray(flipped)
        hits += int((pred[keep] == (labels[keep] > 0.5)).sum())
        total += len(keep)
    return hits / total


def test_cls_asset_accuracy_words(flip_engine):
    """Orientation is well-defined for real words of ≥4 glyphs — the
    classifier must be near-perfect there (these are the lines that decide
    a page's orientation)."""
    acc = _cls_accuracy(flip_engine, p_word=1.0, min_chars=4)
    assert acc >= 0.95, acc


def test_cls_asset_accuracy_random_glyphs(flip_engine):
    """Random glyph strings include intrinsically 180°-ambiguous cases
    (Z/N/s are rotationally symmetric; u↔n, d↔p, 6↔9, {↔} swap into other
    valid glyphs; '.'/''' snap to featureless blobs), so the per-line gate
    is lower — serving resolves these via the page prior
    (cfg.cls_page_prior)."""
    acc = _cls_accuracy(flip_engine, p_word=0.0, min_chars=1)
    assert acc >= 0.85, acc


def test_recognize_strip_flip_c1(flip_engine):
    text = "Forward 42"
    strip = synth.render_line(text, flip_engine.config.rec_height)
    up = flip_engine.recognize(strip)
    down = flip_engine.recognize(strip[::-1, ::-1])
    assert up.text == text and not up.flipped
    assert down.text == text and down.flipped


def test_recognize_strip_no_flip_flag_reads_garbage(engine):
    text = "Forward 42"
    strip = synth.render_line(text, engine.config.rec_height)
    down = engine.recognize(strip[::-1, ::-1])
    assert down.text != text  # guards that the feature is load-bearing


@pytest.mark.slow
def test_ocr_upside_down_page_matches_upright(engine, flip_engine):
    rng = np.random.RandomState(5)
    page, _, texts = synth.render_page(rng, engine.charset)
    img = np.repeat(page[..., None], 3, axis=2)
    img180 = img[::-1, ::-1]

    up = engine.ocr(img)
    flip = flip_engine.ocr(img180)
    got_up = [l.text for l in up.lines]
    got_flip = [l.text for l in flip.lines]
    # the flipped render re-samples every glyph at a half-pixel reflection,
    # so allow a couple of single-glyph confusions (l/I class) vs upright
    assert len(got_flip) == len(got_up), (got_up, got_flip)
    both = [t for t in got_up if t in got_flip]
    assert len(both) >= len(texts) - 2, (got_up, got_flip)

    # without try-flip the upside-down page reads garbage
    plain = engine.ocr(img180)
    wrong = sum(l.text not in texts for l in plain.lines)
    assert wrong * 2 > max(len(plain.lines), 1), \
        [l.text for l in plain.lines]


def test_upside_down_stacked_page_reading_order(flip_engine):
    """A fully upside-down stacked-lines page reads top-to-bottom in the
    ORIGINAL orientation (majority flip reverses the sort)."""
    # single words (the detector may split wide word gaps into two boxes on
    # this synthetic render — a granularity artifact, not an order one) and
    # no l/I confusables (the flipped render re-samples glyphs at a
    # half-pixel offset and can tip those)
    texts = ["alphabet", "mountain", "downstream"]
    page = np.full((320, 480), 255, np.uint8)
    for t, y in zip(texts, (40, 130, 220)):
        s = synth.render_line(t, 32)
        w = min(s.shape[1], 440)
        page[y:y + 32, 20:20 + w] = s[:, :w]
    img180 = np.repeat(page[..., None], 3, axis=2)[::-1, ::-1]
    res = flip_engine.ocr(img180)
    assert [l.text for l in res.lines] == texts, \
        [l.text for l in res.lines]


def test_mixed_page_flips_only_the_rotated_line(flip_engine):
    """One upside-down line among upright ones: line-level flip, page-level
    order stays upright."""
    page = np.full((320, 480), 255, np.uint8)
    texts = ["alphabet", "mountain", "downstream"]
    ys = (40, 130, 220)
    flip_i = 1
    for i, (t, y) in enumerate(zip(texts, ys)):
        s = synth.render_line(t, 32)
        if i == flip_i:
            s = s[::-1, ::-1]
        w = min(s.shape[1], 440)
        page[y:y + 32, 20:20 + w] = s[:, :w]
    img = np.repeat(page[..., None], 3, axis=2)
    res = flip_engine.ocr(img)
    got = [l.text for l in res.lines]
    assert got == texts, got


def _stacked_page(texts, flip_idx=(), ys=(40, 130, 220)):
    page = np.full((320, 480), 255, np.uint8)
    for i, (t, y) in enumerate(zip(texts, ys)):
        s = synth.render_line(t, 32)
        if i in flip_idx:
            s = s[::-1, ::-1]
        w = min(s.shape[1], 440)
        page[y:y + 32, 20:20 + w] = s[:, :w]
    return np.repeat(page[..., None], 3, axis=2)


def test_fused_batch_flip_lanes(flip_engine):
    """The fused program's orientation lanes: a batch holding an upright
    page and a fully-flipped page — both read correctly, the flipped one
    in reversed (original-orientation) reading order, through
    ocr_batch(fused=True)."""
    texts = ["alphabet", "mountain", "downstream"]
    up = _stacked_page(texts)
    down = _stacked_page(texts)[::-1, ::-1]
    r_up, r_down = flip_engine.ocr_batch([up, down], fused=True)
    assert [l.text for l in r_up.lines] == texts, \
        [l.text for l in r_up.lines]
    assert [l.text for l in r_down.lines] == texts, \
        [l.text for l in r_down.lines]


def test_staged_path_flip_matches_fused(flip_engine):
    """force_staged exercises the bucketed-path flip lanes on the same
    flipped page the fused test reads."""
    from ocrjax import api_det
    texts = ["alphabet", "mountain", "downstream"]
    down = _stacked_page(texts)[::-1, ::-1]
    res = api_det.ocr(flip_engine, down, force_staged=True)
    assert [l.text for l in res.lines] == texts, \
        [l.text for l in res.lines]


def test_rot90_quad_mapping_roundtrip():
    from ocrjax import geometry

    rng = np.random.RandomState(4)
    H, W = 60, 100
    img = rng.rand(H, W, 3)
    rot = np.rot90(img)  # (W, H)
    q_rot = np.asarray([[[5.0, 7.0], [30.0, 7.0],
                         [30.0, 15.0], [5.0, 15.0]]], np.float32)
    q_orig = geometry.rot90_ccw_to_orig(q_rot, W)
    # pixel identity: rot[y', x'] == img[y, x] for each mapped corner
    for (xp, yp), (x, y) in zip(q_rot[0], q_orig[0]):
        np.testing.assert_allclose(rot[int(yp), int(xp)],
                                   img[int(y), int(x)])
    # tilt: a horizontal quad in the rotated frame is vertical in the orig
    assert geometry.quad_tilt_deg(q_orig)[0] > 80
    assert geometry.quad_tilt_deg(q_rot)[0] < 10


@pytest.mark.slow
@pytest.mark.parametrize("k", [1, 3])
def test_rot90_page_reads_upright(flip_engine, k):
    """A page scanned in landscape (±90°) reads correctly in original
    reading order: the tilt reroute rotates it, the cls stage fixes the
    direction ambiguity."""
    texts = ["alphabet", "mountain", "downstream"]
    img = np.rot90(_stacked_page(texts), k).copy()
    res = flip_engine.ocr(img)
    assert [l.text for l in res.lines] == texts, \
        (k, [l.text for l in res.lines])
    # boxes come back in the ORIGINAL (landscape) frame
    h, w = img.shape[:2]
    for l in res.lines:
        q = np.asarray(l.box.quad)
        assert (q[:, 0] >= -1).all() and (q[:, 0] <= w).all()
        assert (q[:, 1] >= -1).all() and (q[:, 1] <= h).all()


@pytest.mark.slow
def test_rot90_batch_staged_path(flip_engine):
    """The pooled batched path reroutes rotated pages too (mixed batch of
    upright + landscape pages through bucketing.ocr_pages)."""
    from ocrjax import bucketing
    texts = ["alphabet", "mountain", "downstream"]
    up = _stacked_page(texts)
    rot = np.rot90(up, 1).copy()
    r_up, r_rot = bucketing.ocr_pages(flip_engine, [up, rot])
    assert [l.text for l in r_up.lines] == texts
    assert [l.text for l in r_rot.lines] == texts, \
        [l.text for l in r_rot.lines]


def test_rot90_batch_fused_path(flip_engine):
    """ocr_batch(fused=True) reroutes a CLEAN landscape page: the fused
    rotation reroute's %90 tilt fold reads ~90° boxes as ~0 tilt, so the
    wrapper needs the explicit unfolded-median check (fused.py) — without
    it the separable warp silently reads vertical lines."""
    texts = ["alphabet", "mountain", "downstream"]
    up = _stacked_page(texts)
    rot = np.rot90(up, 1).copy()
    r_up, r_rot = flip_engine.ocr_batch([up, rot], fused=True)
    assert [l.text for l in r_up.lines] == texts
    assert [l.text for l in r_rot.lines] == texts, \
        [l.text for l in r_rot.lines]


@pytest.mark.slow
def test_rot90_tiled_path():
    """ocr_tiled reroutes a landscape document (C5 + ±90°): boxes come back
    in the original landscape frame, text in original reading order."""
    from ocrjax.api import OcrEngine
    texts = ["alphabet", "mountain", "downstream"]
    eng = OcrEngine.from_pretrained()
    eng.config = eng.config.replace(rec_try_flip=True, tile_size=512,
                                    tile_overlap=64)
    up = _stacked_page(texts)           # (320, 480)
    rot = np.rot90(up, 1).copy()        # (480, 320)
    res = eng.ocr_tiled(rot)
    assert [l.text for l in res.lines] == texts, \
        [l.text for l in res.lines]
    h, w = rot.shape[:2]
    for l in res.lines:
        q = np.asarray(l.box.quad)
        assert (q[:, 0] >= -1).all() and (q[:, 0] <= w).all()
        assert (q[:, 1] >= -1).all() and (q[:, 1] <= h).all()


@pytest.mark.slow
def test_untrained_cls_warns_once(caplog):
    """rec_try_flip on an engine with NO cls checkpoint: flip decisions
    come from a random-init net — the dispatch paths must say so (once)."""
    import logging
    from ocrjax.api import OcrEngine

    from ocrjax.utils.logging import get_logger

    eng = OcrEngine(config=TINY.replace(rec_try_flip=True))
    strip = (np.random.RandomState(0).rand(TINY.rec_height, 40)
             * 255).astype(np.uint8)
    logger = get_logger("ocrjax.api")
    logger.propagate = True  # let caplog's root handler see it
    try:
        with caplog.at_level(logging.WARNING, logger="ocrjax.api"):
            eng.recognize_strips([strip])
            eng.recognize_strips([strip])
    finally:
        logger.propagate = False
    warns = [r for r in caplog.records if "random-init" in r.getMessage()]
    assert len(warns) == 1, [r.getMessage() for r in caplog.records]


def test_recognize_strips_flip_over_count_cap():
    """Regression: recognize_strips with try-flip and MORE strips than the
    largest count bucket must not crash (the prior's group array is sized
    from the actual batch rows, not the clamped bucket)."""
    from ocrjax.api import OcrEngine

    eng = OcrEngine(config=TINY.replace(rec_try_flip=True))
    n = TINY.line_batch_buckets[-1] + 2
    rng = np.random.RandomState(3)
    strips = [(rng.rand(TINY.rec_height, 40) * 255).astype(np.uint8)
              for _ in range(n)]
    for same_page in (False, True):
        rs = eng.recognize_strips(strips, same_page=same_page)
        assert len(rs) == n


@pytest.mark.slow
def test_pooled_prior_pools_across_width_buckets():
    """The page-orientation consensus spans width buckets: with a huge
    cls_page_prior every line of one page must get the SAME flip decision
    even when its lines land in different width-bucket dispatches."""
    from ocrjax.api import OcrEngine
    from ocrjax import bucketing
    from ocrjax.bucketing import assign_width_buckets
    from ocrjax.api_det import _estimate_strip_widths

    eng = OcrEngine(config=TINY.replace(rec_try_flip=True,
                                        cls_page_prior=1000.0))
    cfg = eng.config
    rng = np.random.RandomState(2)
    gray = jnp.asarray(rng.rand(1, 96, 96).astype(np.float32))
    # half short quads, half long quads → two width buckets
    n = 8
    x0 = rng.randint(2, 20, size=n).astype(np.float32)
    y0 = rng.randint(2, 80, size=n).astype(np.float32)
    wq = np.where(np.arange(n) % 2 == 0, 12.0, 70.0)
    quads = np.stack([
        np.stack([x0, y0], -1), np.stack([x0 + wq, y0], -1),
        np.stack([x0 + wq, y0 + 8], -1), np.stack([x0, y0 + 8], -1),
    ], axis=1).astype(np.float32)
    est = _estimate_strip_widths(quads, cfg.rec_height)
    assert len(assign_width_buckets(est * (1.25 if cfg.rec_snap_to_ink
                                           else 1.0),
                                    cfg.rec_width_buckets)) >= 2
    page_ids = np.zeros(n, np.int32)
    b_all = np.full((n, 1, 2), 95.0, np.float32)
    _, _, flips = bucketing.recognize_pooled(eng, gray, page_ids, quads,
                                             b_all)
    assert len(set(flips)) == 1, flips


@pytest.mark.slow
def test_recognize_pooled_flip_chunks_over_count_cap():
    """Mechanics on TINY (random weights): the pooled path splits a width
    bucket larger than the count cap instead of crashing, and in flip mode
    returns one (text, conf, flip) triple per quad."""
    from ocrjax.api import OcrEngine
    from ocrjax import bucketing

    eng = OcrEngine(config=TINY.replace(rec_try_flip=True))
    cap = TINY.line_batch_buckets[-1]
    n = cap + 3
    rng = np.random.RandomState(1)
    gray = jnp.asarray(rng.rand(2, 96, 96).astype(np.float32))
    x0 = rng.randint(4, 40, size=n).astype(np.float32)
    y0 = rng.randint(4, 70, size=n).astype(np.float32)
    quads = np.stack([
        np.stack([x0, y0], -1), np.stack([x0 + 40, y0], -1),
        np.stack([x0 + 40, y0 + 10], -1), np.stack([x0, y0 + 10], -1),
    ], axis=1).astype(np.float32)
    page_ids = (np.arange(n) % 2).astype(np.int32)
    b_all = np.full((n, 1, 2), 95.0, np.float32)
    texts, confs, flips = bucketing.recognize_pooled(
        eng, gray, page_ids, quads, b_all)
    assert len(texts) == len(confs) == len(flips) == n
    assert all(t is not None for t in texts)


def test_flip_matmul_matches_gather():
    """flip_strips_by_width's one-hot MXU shift is bit-exact vs the
    take_along_axis formulation it replaced (r5: elementwise dynamic
    gathers serialize on TPU; the contraction rides the MXU)."""
    import jax.numpy as jnp
    from ocrjax.models.cls import flip_strips_by_width

    def gather_flip(strips, widths, flip, pad_value):
        N, H, W = strips.shape
        cols = jnp.arange(W)
        src = (widths[:, None] - 1 - cols[None, :]) % W
        flipped = jnp.take_along_axis(
            strips[:, ::-1, :],
            jnp.broadcast_to(src[:, None, :], (N, H, W)), axis=2)
        flipped = jnp.where(cols[None, None, :] < widths[:, None, None],
                            flipped, pad_value)
        return jnp.where(flip[:, None, None], flipped, strips)

    rng = np.random.RandomState(0)
    strips = jnp.asarray(rng.randn(7, 32, 96).astype(np.float32))
    widths = jnp.asarray(np.array([96, 50, 1, 2, 77, 96, 33], np.int32))
    flip = jnp.asarray(np.array([1, 1, 1, 0, 1, 0, 1], bool))
    a = np.asarray(gather_flip(strips, widths, flip, -1.5))
    b = np.asarray(flip_strips_by_width(strips, widths, flip, -1.5))
    assert np.array_equal(a, b)


def test_single_pass_margin_is_twice_logit():
    """With the antisym certificate + cfg.cls_single_pass, _cls_margins
    returns 2·logit(s) from ONE classifier pass; without it, the
    symmetric ensemble (VERDICT r4 next #5)."""
    import jax
    import jax.numpy as jnp
    from ocrjax.api import OcrEngine
    from ocrjax.api_det import _cls_margins
    from ocrjax.config import TINY

    rng = np.random.RandomState(3)
    strips = jnp.asarray(rng.randn(4, 32, 64).astype(np.float32))
    widths = jnp.asarray(np.array([64, 40, 64, 20], np.int32))

    eng = OcrEngine(config=TINY)
    _, ens = _cls_margins(eng, eng.cls_variables, strips, widths)

    eng2 = OcrEngine(config=TINY)
    eng2.cls_antisym = True
    _, single = _cls_margins(eng2, eng2.cls_variables, strips, widths)
    logit = eng2.cls_model.apply(eng2.cls_variables, strips[..., None],
                                 widths)
    np.testing.assert_allclose(np.asarray(single), 2.0 * np.asarray(logit),
                               rtol=1e-6)
    # a random-init net is not antisymmetric, so the two modes differ
    assert not np.allclose(np.asarray(single), np.asarray(ens))

    # cfg off -> ensemble even with the certificate
    eng3 = OcrEngine(config=TINY.replace(cls_single_pass=False))
    eng3.cls_antisym = True
    _, ens3 = _cls_margins(eng3, eng3.cls_variables, strips, widths)
    np.testing.assert_allclose(np.asarray(ens3), np.asarray(ens), rtol=1e-5)


def test_antisym_training_produces_antisymmetric_logits():
    """A few hundred antisym steps drive logit(s) ≈ −logit(rot180 s), so
    the single-pass margin agrees in SIGN with the ensemble margin."""
    import jax.numpy as jnp
    from ocrjax.charset import default_charset
    from ocrjax.config import TINY
    from ocrjax.models.cls import flip_strips_by_width
    from ocrjax.train.cls_trainer import train_cls
    from ocrjax import preprocess

    r = train_cls(config=TINY, charset=default_charset(), steps=150,
                  batch_size=16, widths=(64,), eval_batches=4,
                  antisym=0.5, lr=2e-3)
    from ocrjax.models.cls import create_cls
    model = create_cls(TINY)
    rng = np.random.RandomState(5)
    from ocrjax.train import synth
    lb = synth.make_line_batch(rng, default_charset(), 16, 64, height=32)
    x = preprocess.rec_normalize(jnp.asarray(lb.images),
                                 TINY.rec_mean, TINY.rec_std)
    w = jnp.asarray(lb.widths)
    l_s = np.asarray(model.apply(r.variables, x, w))
    pad = (0.0 - TINY.rec_mean) / TINY.rec_std
    rot = flip_strips_by_width(x[..., 0], w,
                               jnp.ones(x.shape[:1], bool), pad)
    l_r = np.asarray(model.apply(r.variables, rot[..., None], w))
    # antisymmetry: |l(s) + l(rot)| small relative to margin scale
    asym = np.abs(l_s + l_r)
    scale = np.abs(l_s - l_r).mean() + 1e-6
    assert asym.mean() < 0.5 * scale, (asym.mean(), scale)
