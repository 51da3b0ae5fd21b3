"""Training checkpoint/resume (SURVEY.md §5 "Checkpoint / resume").

The reference persists only final weight files; training here checkpoints
the full step state — params, batch stats, optimizer state, step counter —
as one safetensors file, so interrupted runs resume exactly. (orbax is
available in the image, but one flat safetensors file keeps the dependency
surface identical to inference weights and is trivially inspectable.)
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax

from ocrjax import weights as W


def save_train_state(path: str, step: int, params: Any, batch_stats: Any,
                     opt_state: Any, extra_meta: Optional[Dict[str, str]] = None
                     ) -> None:
    flat_opt, opt_treedef = jax.tree_util.tree_flatten(opt_state)
    tree = {
        "params": params,
        "batch_stats": batch_stats,
        "opt": {str(i): leaf for i, leaf in enumerate(flat_opt)},
    }
    meta = {"step": str(step), "opt_treedef": str(opt_treedef)}
    meta.update(extra_meta or {})
    W.save_variables(path, tree, metadata=meta)


def load_train_state(path: str, opt_state_like: Any
                     ) -> Tuple[int, Any, Any, Any]:
    """opt_state_like: a freshly tx.init()'d opt state providing the pytree
    structure to restore into. Returns (step, params, batch_stats, opt)."""
    tree = W.load_variables(path)
    meta = W.load_metadata(path)
    step = int(meta.get("step", "0"))
    flat_like, treedef = jax.tree_util.tree_flatten(opt_state_like)
    opt_leaves = [tree["opt"][str(i)] for i in range(len(flat_like))]
    opt_state = jax.tree_util.tree_unflatten(treedef, opt_leaves)
    return step, tree["params"], tree["batch_stats"], opt_state


def latest_checkpoint(ckpt_dir: str, prefix: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(ckpt_dir):
        if name.startswith(prefix) and name.endswith(".safetensors"):
            try:
                step = int(name[len(prefix):-len(".safetensors")].strip("_"))
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(ckpt_dir, name), step
    return best
