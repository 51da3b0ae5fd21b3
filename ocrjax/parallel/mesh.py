"""Device mesh + sharding (SURVEY.md §2.2, §2.3 N7).

The reference has no distributed layer at all — a single libtorch process
(SURVEY.md §2.2: "Communication backend: none"). The TPU rebuild scales via
GSPMD: a (dp, tp) `jax.sharding.Mesh`, batch axes sharded over "dp", the
recognizer's projection matmuls sharded over "tp", params otherwise
replicated. XLA inserts the collectives (grad psum over dp, logits
all-gather over tp) — no hand-written NCCL-style calls, and they ride ICI on
a real pod. On 1 chip everything degrades to no-ops, so the annotations are
zero-cost (SURVEY.md §2.2 "mesh-ready DP").
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(n_dp: Optional[int] = None, n_tp: int = 1,
              devices=None) -> Mesh:
    """(dp, tp) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_dp is None:
        n_dp = n // n_tp
    if n_dp * n_tp != n:
        raise ValueError(f"{n_dp}x{n_tp} mesh != {n} devices")
    arr = np.array(devices).reshape(n_dp, n_tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over dp, rest replicated."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """device_put every array with its leading axis split over dp."""
    def put(x):
        x = jnp.asarray(x)
        # P("dp") shards axis 0; trailing axes are implicitly replicated
        return jax.device_put(x, NamedSharding(mesh, P(DP_AXIS)))
    return jax.tree.map(put, tree)


def _param_spec(path: tuple, value, n_tp: int) -> P:
    """TP sharding rule for CRNN params — Megatron-style column parallelism
    on every feature-producing axis, so the tp axis shards real FLOPs (not
    just the tiny projection):

    * Dense / LSTM-gate kernels (2-D): output-features axis over tp. Flax's
      OptimizedLSTMCell keeps one matrix per gate (ii/if/ig/io, hi/hf/hg/ho),
      so this is per-gate column parallelism; the hidden state comes out
      tp-sharded and GSPMD inserts the per-step collectives for the
      recurrent contraction.
    * Conv kernels (4-D HWIO): output-channel axis over tp; the next conv's
      contraction over the sharded input channels becomes a psum.
    * 1-D channel/feature vectors (conv & gate biases, BN scale/bias, and
      BN running stats in batch_stats): sharded over tp to match the
      activations they broadcast against.

    Axes that don't divide n_tp stay replicated (GSPMD requires even
    splits). Path entries are flax dict keys, e.g. ('params', 'Dense_0',
    'kernel').
    """
    names = [getattr(p, "key", str(p)) for p in path]
    leaf = names[-1] if names else ""
    div = lambda ax: value.shape[ax] % n_tp == 0
    if leaf == "kernel" and value.ndim == 2 and div(1) and any(
            "Dense" in n or "LSTMCell" in n for n in names):
        return P(None, TP_AXIS)
    if leaf == "kernel" and value.ndim == 4 and div(3):
        return P(None, None, None, TP_AXIS)
    if value.ndim == 1 and div(0) and leaf in (
            "bias", "scale", "mean", "var"):
        return P(TP_AXIS)
    return P()


def shard_params(mesh: Mesh, variables: Any) -> Any:
    """Apply the TP rules to a flax variables tree (replicate the rest)."""
    n_tp = mesh.shape[TP_AXIS]

    def put(path, x):
        x = jnp.asarray(x)
        return jax.device_put(x, NamedSharding(
            mesh, _param_spec(path, x, n_tp)))

    return jax.tree_util.tree_map_with_path(put, variables)


# ---------------------------------------------------------------------------
# Sharded recognition training step (the multi-chip path the driver dry-runs)
# ---------------------------------------------------------------------------

def make_sharded_rec_train_step(model, tx, mesh: Mesh):
    """THE production rec train step (train.rec_trainer.make_train_step —
    not a copy) jit'd for the mesh: dp-sharded batch, tp-sharded params
    (shard_params), GSPMD inserting the cross-device reductions from the
    input shardings. The mesh argument documents intent; sharding comes
    from the operands (shard_batch / shard_params), which is what lets the
    SAME jitted step serve single-device training unchanged."""
    del mesh  # sharding flows from the operands (GSPMD)
    from ocrjax.train.rec_trainer import make_train_step
    return make_train_step(model, tx, donate=True)


def init_sharded_rec_state(config, charset, mesh: Mesh, width: int = 64,
                           lr: float = 1e-3, seed: int = 0):
    """Init CRNN train state with params/opt-state laid out on the mesh."""
    from ocrjax.models.crnn import create_crnn

    model = create_crnn(config, charset.num_classes)
    variables = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, config.rec_height, width, 1), jnp.float32))
    variables = shard_params(mesh, variables)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(lr)
    opt_state = jax.tree.map(
        lambda x: x, tx.init(params))  # inherits param shardings
    return model, tx, params, batch_stats, opt_state


# ---------------------------------------------------------------------------
# Sharded batch inference (C4/C5 serving DP — SURVEY.md §2.2 primary strategy)
# ---------------------------------------------------------------------------

def make_sharded_fused_ocr_fn(engine, mesh: Mesh, lines_per_page: int = 32,
                              bucket_width: int = 320):
    """The fused e2e program (ocrjax.fused) jit'd over the mesh: page batch
    dp-sharded, model params replicated, packed output dp-sharded. Every
    page's det→boxes→warp→rec→ctc chain is independent, so GSPMD needs zero
    collectives until the host gathers the packed payload — throughput
    scales linearly with dp size.

    Signature matches ocrjax.fused.make_fused_ocr_fn's program:
    (det_vars, rec_vars, cls_vars, gray_u8 (B,S,S) u8, thr (4,),
    valid_wh (B,2)) → one packed payload row per page (uint8 under
    cfg.fetch_bytes, legacy float32 otherwise — unpack with
    ocrjax.fused.unpack_fused, which dispatches on dtype). B must be
    divisible by the dp axis size.
    """
    from ocrjax import fused as F

    inner = F.make_fused_ocr_fn(
        engine, lines_per_page, bucket_width).__wrapped__
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(inner,
                   in_shardings=(rep, rep, rep, bs, rep, bs),
                   out_shardings=bs)


def shard_tiled_serving(engine, mesh: Optional[Mesh]) -> None:
    """Enable (or disable, mesh=None) dp-sharded C5 tiled serving on an
    engine: every tile-detection dispatch of ocr_tiled/ocr_tiled_batch
    pads its tile stack to a dp multiple and runs the tile program with
    the tile axis sharded over dp (tiling._dispatch_group). Per-tile
    chains are independent, so GSPMD inserts zero collectives — detection
    throughput scales with the dp size; the host-side seam merge and the
    pooled recognition pipeline are unchanged (SURVEY.md §2.2: the tile
    axis is the C5 path's natural DP shard axis)."""
    engine.tile_mesh = mesh
    engine._tile_fwd_sharded_cache = None
