"""DB detector training loop (SURVEY.md §2.3 N11).

DB loss = OHEM-balanced BCE on the prob map (hard-negative ratio 3:1)
        + dice loss on the differentiable binary map
        + 10 × masked L1 on the threshold map,
the standard Differentiable Binarization objective. One fused jit step
(forward, loss, adam, batch-stats) — sharding-agnostic, pjit-able by
ocrjax.parallel.mesh for multi-chip DP.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ocrjax import preprocess
from ocrjax.charset import Charset, default_charset
from ocrjax.config import OcrConfig
from ocrjax.models.db import create_db
from ocrjax.train import det_gt

OHEM_RATIO = 3.0


def db_loss(out: Dict[str, jnp.ndarray], gt_shrink, gt_thresh, thresh_mask):
    prob, thresh, binary = out["prob"], out["thresh"], out["binary"]
    eps = 1e-6

    # --- OHEM-balanced BCE on prob ----------------------------------------
    bce = -(gt_shrink * jnp.log(prob + eps)
            + (1 - gt_shrink) * jnp.log(1 - prob + eps))
    pos = gt_shrink
    neg = 1.0 - gt_shrink
    n_pos = jnp.sum(pos, axis=(1, 2), keepdims=True)
    n_neg_keep = jnp.minimum(jnp.sum(neg, axis=(1, 2), keepdims=True),
                             n_pos * OHEM_RATIO + 64.0)
    neg_bce = bce * neg
    # threshold that keeps ~n_neg_keep hardest negatives (per image):
    # sort-free OHEM via quantile on the negative losses
    B = prob.shape[0]
    flat = neg_bce.reshape(B, -1)
    k = jnp.clip(n_neg_keep.reshape(B), 1.0, flat.shape[1] - 1.0)
    q = 1.0 - k / flat.shape[1]
    cut = jax.vmap(lambda f, qq: jnp.quantile(f, qq))(flat, q)
    hard_neg = neg * (neg_bce >= cut[:, None, None])
    sel = pos + hard_neg
    l_prob = jnp.sum(bce * sel) / (jnp.sum(sel) + eps)

    # --- dice on binary ----------------------------------------------------
    inter = jnp.sum(binary * gt_shrink)
    l_bin = 1.0 - 2.0 * inter / (jnp.sum(binary) + jnp.sum(gt_shrink) + eps)

    # --- masked L1 on thresh -----------------------------------------------
    l_thr = (jnp.sum(jnp.abs(thresh - gt_thresh) * thresh_mask)
             / (jnp.sum(thresh_mask) + eps))

    return l_prob + l_bin + 10.0 * l_thr, {
        "prob": l_prob, "binary": l_bin, "thresh": l_thr}


@dataclasses.dataclass
class DetTrainResult:
    variables: Dict[str, Any]
    history: list
    recall: float
    precision: float


def make_det_train_step(model, tx, cfg) -> Callable:
    hs = getattr(cfg, "det_head_stride", 1)

    def loss_fn(params, batch_stats, images_u8, gts, gtt, gtm):
        x = preprocess.det_normalize(images_u8, cfg.det_mean, cfg.det_std)
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, mutable=["batch_stats"])
        if hs > 1:
            # strided head: supervise at the map's native grid with
            # AVG-POOLED full-res gt (det_gt stays stride-free). Soft pooled
            # targets preserve sub-cell structures — center sampling missed
            # thin shrink kernels entirely and cost 0.19 recall at stride 4.
            def pool(m):
                return jax.lax.reduce_window(
                    m, 0.0, jax.lax.add, (1, hs, hs), (1, hs, hs), "VALID"
                ) / float(hs * hs)
            gts_, gtt_, gtm_ = pool(gts), pool(gtt), (
                jax.lax.reduce_window(gtm, 0.0, jax.lax.max,
                                      (1, hs, hs), (1, hs, hs), "VALID"))
        else:
            gts_, gtt_, gtm_ = gts, gtt, gtm
        loss, parts = db_loss(out, gts_, gtt_, gtm_)
        return loss, (updates["batch_stats"], parts)

    @jax.jit
    def step(params, batch_stats, opt_state, images_u8, gts, gtt, gtm):
        (loss, (new_bs, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
                params, batch_stats, images_u8, gts, gtt, gtm)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss, parts

    return step


def eval_detection(model, variables, cfg, charset, rng, n_pages=8,
                   size=None, iou_thresh=0.5):
    """Recall/precision of extract_boxes against synthetic GT quads."""
    from ocrjax import geometry
    from ocrjax.postprocess import db_boxes
    from ocrjax.train import synth

    size = size or cfg.det_max_side

    @jax.jit
    def fwd(images_u8):
        x = preprocess.det_normalize(images_u8, cfg.det_mean, cfg.det_std)
        prob = model.apply(variables, x)["prob"]
        return jax.vmap(
            lambda p: db_boxes.extract_boxes_from_config(p, cfg))(prob)

    tp = fp = fn = 0
    for _ in range(n_pages):
        page, gt_quads, _ = synth.render_page(
            rng, charset, size=(size, size))
        img = np.repeat(page[..., None], 3, axis=2)
        cand = fwd(jnp.asarray(img[None]))
        valid = np.asarray(cand["valid"])[0]
        boxes = np.asarray(cand["boxes"])[0][valid]
        matched = set()
        for gt in gt_quads:
            best, best_iou = None, 0.0
            for i, bx in enumerate(boxes):
                iou = geometry.quad_iou_aabb(gt, bx)
                if iou > best_iou:
                    best, best_iou = i, iou
            if best is not None and best_iou >= iou_thresh \
                    and best not in matched:
                matched.add(best)
                tp += 1
            else:
                fn += 1
        fp += len(boxes) - len(matched)
    recall = tp / max(tp + fn, 1)
    precision = tp / max(tp + fp, 1)
    return recall, precision


def train_det(
    config: Optional[OcrConfig] = None,
    charset: Optional[Charset] = None,
    steps: int = 1200,
    batch_size: int = 8,
    size: int = 320,
    lr: float = 3e-4,
    seed: int = 0,
    log_every: int = 50,
    log: Callable[[str], None] = print,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 500,
    p_word: float = 0.0,
    init_variables=None,
    degrade: float = 0.0,
    p_dense: float = 0.0,
    arch: Optional[Dict] = None,
    mesh=None,
) -> DetTrainResult:
    """Train on `size`-px synthetic pages (conv translation invariance makes
    the weights valid at the full det_max_side canvas). p_word mixes
    word-like lines into the pages (synth.word_text); init_variables
    warm-starts from existing weights (fine-tuning). degrade/p_dense: scan
    degradation + dense-page mixing (det_gt.make_det_batch)."""
    config = config or OcrConfig()
    charset = charset or default_charset()
    if arch is not None:
        # variant training (models.db.DB_ARCHS, e.g. the cheap tile-scale
        # detector): the head stride must flow into the config so the gt
        # pooling above and the eval's coord_stride match the model
        from ocrjax.models.db import create_db_arch
        config = config.replace(
            det_head_stride=int(arch.get("head_stride", 1)))
        model = create_db_arch(config, arch)
    else:
        model = create_db(config)

    variables = init_variables or model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, size, size, 3), jnp.float32))
    if mesh is not None:
        # same delegation as the rec trainer (parallel.mesh): params laid
        # out by shard_params (dp-replicated, tp rules for conv kernels),
        # batches dp-sharded below; GSPMD inserts the grad psum. The jitted
        # step itself is unchanged — sharding flows from the operands.
        from ocrjax.parallel import mesh as M
        variables = M.shard_params(mesh, variables)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adam(optax.warmup_cosine_decay_schedule(
            0.0, lr, min(100, steps // 10 + 1), steps)),
    )
    opt_state = tx.init(params)
    step_fn = make_det_train_step(model, tx, config)

    start_step = 0
    if ckpt_dir:
        from ocrjax.train import checkpoint as C
        latest = C.latest_checkpoint(ckpt_dir, "det_")
        if latest:
            start_step, params, batch_stats, opt_state = C.load_train_state(
                latest, opt_state)
            if mesh is not None:
                from ocrjax.parallel import mesh as M
                sharded = M.shard_params(
                    mesh, {"params": params, "batch_stats": batch_stats})
                params, batch_stats = (sharded["params"],
                                       sharded["batch_stats"])
                opt_state = jax.tree.map(jnp.asarray, opt_state)
            log(f"[det] resumed from {latest} at step {start_step}")
    rng = np.random.RandomState(seed + start_step)

    history = []
    t0 = time.time()
    for step in range(start_step + 1, steps + 1):
        imgs, gts, gtt, gtm = det_gt.make_det_batch(
            rng, charset, batch_size, size, p_word=p_word,
            degrade=degrade, p_dense=p_dense)
        if mesh is None:
            batch_dev = (jnp.asarray(imgs), jnp.asarray(gts),
                         jnp.asarray(gtt), jnp.asarray(gtm))
        else:
            from ocrjax.parallel import mesh as M
            batch_dev = M.shard_batch(mesh, (imgs, gts, gtt, gtm))
        params, batch_stats, opt_state, loss, parts = step_fn(
            params, batch_stats, opt_state, *batch_dev)
        if step % log_every == 0 or step == steps:
            history.append((step, float(loss)))
            log(f"[det {step}/{steps}] loss={float(loss):.4f} "
                f"prob={float(parts['prob']):.3f} "
                f"bin={float(parts['binary']):.3f} "
                f"thr={float(parts['thresh']):.3f} "
                f"({time.time() - t0:.0f}s)")
        if ckpt_dir and (step % ckpt_every == 0 or step == steps):
            import os
            from ocrjax.train import checkpoint as C
            os.makedirs(ckpt_dir, exist_ok=True)
            C.save_train_state(
                os.path.join(ckpt_dir, f"det_{step}.safetensors"),
                step, params, batch_stats, opt_state)

    variables = {"params": params, "batch_stats": batch_stats}
    eval_rng = np.random.RandomState(seed + 999)
    recall, precision = eval_detection(
        model, variables, config, charset, eval_rng, size=size)
    log(f"[det] eval recall={recall:.3f} precision={precision:.3f}")
    return DetTrainResult(variables, history, recall, precision)
