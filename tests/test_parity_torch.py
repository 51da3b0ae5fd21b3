"""Torch-twin golden parity (SURVEY.md §4.2 "Golden parity (a)").

The reference bar is "bit-comparable boxes and identical decoded strings"
(BASELINE.json:5); with the reference mount empty, the cross-framework twin
is the offline substitute: one set of weights, two independent
implementations (flax/XLA vs torch/CPU), asserting

  * CRNN logits close + identical decoded strings (both directions of the
    ocrjax.weights N8 key mapping — flax→torch export AND torch→flax
    drop-in conversion);
  * DB prob maps close; host-postprocessed boxes near-identical (IoU);
  * 20-page end-to-end golden parity with the SHIPPED assets: same boxes
    (IoU ≥ 0.999 after int rounding) and exact same decoded strings.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ocrjax import weights as W  # noqa: E402
from ocrjax.charset import Charset  # noqa: E402
from ocrjax.models.crnn import CRNN  # noqa: E402
from ocrjax.models.db import DBDetector  # noqa: E402
from ocrjax.ops import ctc  # noqa: E402
from ocrjax.parity.torch_twin import TorchCRNN, TorchDB  # noqa: E402


def _load_twin(twin, sd):
    missing, unexpected = twin.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    # only BN bookkeeping may be absent from the converted dict
    assert all("num_batches_tracked" in k for k in missing), missing
    assert not unexpected, unexpected
    twin.eval()
    return twin


def _numpy_ctc_greedy(logits: np.ndarray, lengths: np.ndarray,
                      blank: int = 0):
    """Scalar-loop CTC greedy decode — the reference-style host decoder."""
    out = []
    for b in range(logits.shape[0]):
        ids = logits[b, : lengths[b]].argmax(axis=-1)
        toks, prev = [], -1
        for i in ids:
            if i != blank and i != prev:
                toks.append(int(i))
            prev = int(i)
        out.append(toks)
    return out


# ---------------------------------------------------------------------------
# CRNN
# ---------------------------------------------------------------------------

CH = (16, 24, 32, 48)
HID = 32
NCLS = 21


def _small_crnn():
    return CRNN(num_classes=NCLS, hidden=HID, channels=CH,
                dtype=jnp.float32, param_dtype=jnp.float32)


def _small_twin():
    return TorchCRNN(num_classes=NCLS, hidden=HID, channels=CH)


def _rand_strips(rng, n=4, w=64):
    imgs = rng.rand(n, 32, w, 1).astype(np.float32) * 2 - 1
    widths = np.asarray([w, w - 4, w // 2, 24][:n], np.int32)
    return imgs, widths


def test_crnn_flax_to_torch_logit_parity():
    rng = np.random.RandomState(0)
    imgs, widths = _rand_strips(rng)
    model = _small_crnn()
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(imgs),
                           jnp.asarray(widths))
    logits_f, lens_f = model.apply(variables, jnp.asarray(imgs),
                                   jnp.asarray(widths))
    logits_f = np.asarray(logits_f)

    twin = _load_twin(_small_twin(), W.crnn_torch_state_dict(variables))
    with torch.no_grad():
        logits_t, lens_t = twin(
            torch.tensor(imgs.transpose(0, 3, 1, 2)), torch.tensor(widths))
    logits_t = logits_t.numpy()

    assert np.array_equal(np.asarray(lens_f), lens_t.numpy())
    for b, L in enumerate(np.asarray(lens_f)):
        np.testing.assert_allclose(
            logits_f[b, :L], logits_t[b, :L], atol=5e-3,
            err_msg=f"sample {b}")


def test_crnn_torch_to_flax_converter_dropin():
    """The N8 converter: a torch checkpoint (twin naming) drops into the
    flax model and produces the same logits."""
    rng = np.random.RandomState(2)
    imgs, widths = _rand_strips(rng)
    twin = _small_twin().eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, W.crnn_variables_from_torch(sd))

    model = _small_crnn()
    logits_f, lens_f = model.apply(variables, jnp.asarray(imgs),
                                   jnp.asarray(widths))
    with torch.no_grad():
        logits_t, _ = twin(
            torch.tensor(imgs.transpose(0, 3, 1, 2)), torch.tensor(widths))
    for b, L in enumerate(np.asarray(lens_f)):
        np.testing.assert_allclose(
            np.asarray(logits_f)[b, :L], logits_t.numpy()[b, :L], atol=5e-3)


def test_crnn_converter_accepts_bidirectional_naming():
    """Standard torch checkpoints use nn.LSTM(bidirectional=True) naming
    (weight_ih_l0_reverse); the converter must accept that too."""
    twin = _small_twin().eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    renamed = {}
    for k, v in sd.items():
        for p in ("lstm0", "lstm1"):
            if k.startswith(f"{p}.fwd."):
                k = f"{p}." + k[len(f"{p}.fwd."):]
            elif k.startswith(f"{p}.bwd."):
                k = f"{p}." + k[len(f"{p}.bwd."):] + "_reverse"
        renamed[k] = v
    va = jax.tree.map(jnp.asarray, W.crnn_variables_from_torch(renamed))
    vb = jax.tree.map(jnp.asarray, W.crnn_variables_from_torch(sd))
    ja = jax.tree_util.tree_leaves(va)
    jb = jax.tree_util.tree_leaves(vb)
    for a, b in zip(ja, jb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crnn_identical_decoded_strings_on_renders():
    """Rendered text lines through both frameworks → exact same strings."""
    from ocrjax.train import synth

    charset = Charset("abcdefghijklmnopqrst")
    assert charset.num_classes == NCLS
    rng = np.random.RandomState(3)
    model = _small_crnn()
    strips, widths = [], []
    Wb = 160
    batch = np.full((8, 32, Wb), 0, np.uint8)
    for i in range(8):
        t = synth.random_text(rng, charset, 3, 10)
        s = synth.render_line(t, 32)
        w = min(s.shape[1], Wb)
        batch[i, :, :w] = s[:, :w]
        widths.append(w)
    widths = np.asarray(widths, np.int32)
    x = (batch.astype(np.float32) / 255.0 - 0.5) / 0.5
    variables = model.init(jax.random.PRNGKey(4), jnp.asarray(x[..., None]),
                           jnp.asarray(widths))

    logits_f, lens_f = model.apply(variables, jnp.asarray(x[..., None]),
                                   jnp.asarray(widths))
    toks_f, n_f, _ = ctc.ctc_greedy_decode(logits_f, lens_f, blank=0,
                                           max_tokens=32)
    strings_f = [charset.decode(np.asarray(toks_f)[i][: int(n)])
                 for i, n in enumerate(np.asarray(n_f))]

    twin = _load_twin(_small_twin(), W.crnn_torch_state_dict(variables))
    with torch.no_grad():
        logits_t, lens_t = twin(torch.tensor(x[:, None]),
                                torch.tensor(widths))
    toks_t = _numpy_ctc_greedy(logits_t.numpy(), lens_t.numpy(), blank=0)
    strings_t = [charset.decode(t) for t in toks_t]
    assert strings_f == strings_t


# ---------------------------------------------------------------------------
# DB detector
# ---------------------------------------------------------------------------

DB_CH = (8, 12, 16, 24)
DB_INNER = 16


def _small_db():
    return DBDetector(channels=DB_CH, inner=DB_INNER,
                      dtype=jnp.float32, param_dtype=jnp.float32)


def _small_db_twin():
    return TorchDB(channels=DB_CH, inner=DB_INNER)


def test_db_twin_prob_map_parity():
    rng = np.random.RandomState(5)
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    model = _small_db()
    variables = model.init(jax.random.PRNGKey(6), jnp.asarray(x))
    prob_f = np.asarray(model.apply(variables, jnp.asarray(x))["prob"])

    twin = _load_twin(_small_db_twin(), W.db_torch_state_dict(
        variables, channels=DB_CH))
    with torch.no_grad():
        prob_t = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(prob_f, prob_t, atol=5e-3)


def test_db_torch_to_flax_converter_dropin():
    """Torch DB checkpoint (prob head only) → flax variables → same map."""
    rng = np.random.RandomState(7)
    x = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    twin = _small_db_twin().eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = jax.tree.map(
        jnp.asarray, W.db_variables_from_torch(sd, channels=DB_CH))
    model = _small_db()
    prob_f = np.asarray(model.apply(variables, jnp.asarray(x))["prob"])
    with torch.no_grad():
        prob_t = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(prob_f, prob_t, atol=5e-3)


# ---------------------------------------------------------------------------
# 20-page end-to-end golden parity with the shipped assets
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Orientation-classifier twin (rec_try_flip "cls" stage)
# ---------------------------------------------------------------------------

def _cls_pair(channels=(8, 12, 16)):
    from ocrjax.models.cls import OrientationClassifier
    from ocrjax.parity.torch_twin import TorchCLS
    return (OrientationClassifier(channels=channels,
                                  compute_dtype="float32"),
            TorchCLS(channels=channels))


def test_cls_flax_to_torch_logit_parity():
    rng = np.random.RandomState(3)
    imgs, widths = _rand_strips(rng)
    model, twin = _cls_pair()
    variables = model.init(jax.random.PRNGKey(4),
                           jnp.asarray(imgs), jnp.asarray(widths))
    logit_f = np.asarray(model.apply(variables, jnp.asarray(imgs),
                                     jnp.asarray(widths)))
    twin = _load_twin(twin, W.cls_torch_state_dict(variables))
    with torch.no_grad():
        logit_t = twin(torch.tensor(imgs.transpose(0, 3, 1, 2)),
                       torch.tensor(widths)).numpy()
    np.testing.assert_allclose(logit_f, logit_t, atol=5e-3)


def test_cls_torch_to_flax_converter_dropin():
    rng = np.random.RandomState(5)
    imgs, widths = _rand_strips(rng)
    model, twin = _cls_pair()
    twin = twin.eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, W.cls_variables_from_torch(sd))
    logit_f = np.asarray(model.apply(variables, jnp.asarray(imgs),
                                     jnp.asarray(widths)))
    with torch.no_grad():
        logit_t = twin(torch.tensor(imgs.transpose(0, 3, 1, 2)),
                       torch.tensor(widths)).numpy()
    np.testing.assert_allclose(logit_f, logit_t, atol=5e-3)


def test_cls_shipped_asset_decision_parity():
    """The shipped orientation asset through both frameworks: same
    symmetric-ensemble flip decisions on rendered strips (float32 flax vs
    float32 torch; the serving bf16 path is gated separately in
    tests/test_try_flip.py)."""
    from ocrjax.api import OcrEngine
    from ocrjax.models.cls import OrientationClassifier
    from ocrjax.parity.torch_twin import TorchCLS
    from ocrjax.train import synth
    from ocrjax import preprocess

    engine = OcrEngine.from_pretrained()
    cfg = engine.config
    model = OrientationClassifier(compute_dtype="float32")
    variables = engine.cls_variables
    twin = _load_twin(TorchCLS(), W.cls_torch_state_dict(variables))

    rng = np.random.RandomState(6)
    from ocrjax.train.cls_trainer import flip_half
    lb = synth.make_line_batch(rng, engine.charset, 32, 192,
                               height=cfg.rec_height, p_word=0.7,
                               max_len=14)
    flip_half(rng, lb)
    x = np.asarray(preprocess.rec_normalize(
        jnp.asarray(lb.images), cfg.rec_mean, cfg.rec_std))
    widths = lb.widths.astype(np.int32)
    logit_f = np.asarray(model.apply(variables, jnp.asarray(x),
                                     jnp.asarray(widths)))
    with torch.no_grad():
        logit_t = twin(torch.tensor(x.transpose(0, 3, 1, 2)),
                       torch.tensor(widths)).numpy()
    np.testing.assert_allclose(logit_f, logit_t, atol=1e-2, rtol=1e-3)


def _iou_quad(a: np.ndarray, b: np.ndarray) -> float:
    import cv2
    span = np.concatenate([a, b]).max(axis=0).astype(int) + 2
    ma = np.zeros(span[::-1], np.uint8)
    mb = np.zeros(span[::-1], np.uint8)
    cv2.fillPoly(ma, [np.round(a).astype(np.int32)], 1)
    cv2.fillPoly(mb, [np.round(b).astype(np.int32)], 1)
    inter = (ma & mb).sum()
    union = (ma | mb).sum()
    return inter / max(union, 1)


@pytest.mark.slow
def test_e2e_golden_parity_20_pages():
    """Shipped det+rec assets through flax AND the torch twins on 20
    synthetic pages: boxes bit-comparable (IoU ≥ 0.999 over int-rounded
    quads, SURVEY.md §7 'Bit-comparable boxes'), decoded strings exactly
    equal. The prob maps come from each framework's own forward; the host
    cv2 postprocess (the reference's algorithm) is shared."""
    from ocrjax.api import OcrEngine
    from ocrjax.postprocess.host_boxes import extract_boxes_host
    from ocrjax.train import synth
    from ocrjax import preprocess

    engine = OcrEngine.from_pretrained()
    cfg = engine.config.replace(compute_dtype="float32", det_max_side=512)
    charset = engine.charset

    # float32 flax models over the shipped variables
    det_model = DBDetector(head_stride=cfg.det_head_stride,
                           dtype=jnp.float32, param_dtype=jnp.float32)
    from ocrjax.models.crnn import create_crnn
    rec_model = create_crnn(cfg, charset.num_classes)
    from ocrjax.api_det import _det_state
    det_vars = _det_state(engine).variables
    rec_vars = engine.rec_variables

    det_twin = _load_twin(TorchDB(), W.db_torch_state_dict(det_vars))
    rec_twin = _load_twin(
        TorchCRNN(num_classes=charset.num_classes, hidden=cfg.rec_hidden,
                  channels=tuple(cfg.rec_conv_channels),
                  input_height=cfg.rec_height),
        W.crnn_torch_state_dict(rec_vars))

    rng = np.random.RandomState(11)
    n_pages = 20
    mean = np.asarray(cfg.det_mean, np.float32)
    std = np.asarray(cfg.det_std, np.float32)
    checked_boxes = 0
    checked_strings = 0
    for p in range(n_pages):
        page, _, _ = synth.render_page(
            rng, charset, size=(cfg.det_max_side, cfg.det_max_side),
            n_lines=(2, 5), text_height=(20, 40))
        x = np.repeat(page[..., None], 3, 2).astype(np.float32) / 255.0
        x = (x - mean) / std

        prob_f = np.asarray(det_model.apply(
            det_vars, jnp.asarray(x[None]))["prob"])[0]
        with torch.no_grad():
            prob_t = det_twin(
                torch.tensor(x.transpose(2, 0, 1)[None])).numpy()[0]
        assert np.abs(prob_f - prob_t).max() < 2e-2, f"page {p}"

        boxes_f, _ = extract_boxes_host(
            prob_f, cfg.det_thresh, cfg.det_box_thresh, cfg.det_unclip_ratio)
        boxes_t, _ = extract_boxes_host(
            prob_t, cfg.det_thresh, cfg.det_box_thresh, cfg.det_unclip_ratio)
        assert len(boxes_f) == len(boxes_t), f"page {p}"
        # match by centroid ordering (same underlying page)
        order_f = np.argsort([q[:, 1].mean() * 1e4 + q[:, 0].mean()
                              for q in boxes_f])
        order_t = np.argsort([q[:, 1].mean() * 1e4 + q[:, 0].mean()
                              for q in boxes_t])
        strips, widths = [], []
        for i, j in zip(order_f, order_t):
            iou = _iou_quad(boxes_f[i], boxes_t[j])
            assert iou >= 0.999, f"page {p}: IoU {iou:.4f}"
            checked_boxes += 1
            q = boxes_f[i]
            x0, x1 = int(q[:, 0].min()), int(np.ceil(q[:, 0].max())) + 1
            y0, y1 = int(q[:, 1].min()), int(np.ceil(q[:, 1].max())) + 1
            crop = page[max(0, y0):y1, max(0, x0):x1]
            if crop.size == 0:
                continue
            strips.append(preprocess.rec_resize(crop, cfg.rec_height))

        if not strips:
            continue
        Wb = max(s.shape[1] for s in strips)
        Wb = -(-Wb // 4) * 4
        batch = np.zeros((len(strips), cfg.rec_height, Wb), np.uint8)
        for i, s in enumerate(strips):
            batch[i, :, : s.shape[1]] = s[:, :Wb]
            widths.append(min(s.shape[1], Wb))
        widths = np.asarray(widths, np.int32)
        xs = (batch.astype(np.float32) / 255.0 - cfg.rec_mean) / cfg.rec_std

        logits_f, lens_f = rec_model.apply(
            rec_vars, jnp.asarray(xs[..., None]), jnp.asarray(widths))
        toks_f, n_f, _ = ctc.ctc_greedy_decode(
            logits_f, lens_f, blank=cfg.ctc_blank, max_tokens=64)
        strings_f = [charset.decode(np.asarray(toks_f)[i][: int(n)])
                     for i, n in enumerate(np.asarray(n_f))]
        with torch.no_grad():
            logits_t, lens_t = rec_twin(torch.tensor(xs[:, None]),
                                        torch.tensor(widths))
        strings_t = [charset.decode(t) for t in _numpy_ctc_greedy(
            logits_t.numpy(), lens_t.numpy(), blank=cfg.ctc_blank)]
        assert strings_f == strings_t, f"page {p}"
        checked_strings += len(strings_f)

    assert checked_boxes >= 20, "too few boxes exercised"
    assert checked_strings >= 20, "too few strings exercised"
