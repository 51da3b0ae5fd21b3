"""Model weight save/load (SURVEY.md §2.1 R8, §2.3 N8).

The reference loads tch VarStore `.ot` / TorchScript `.pt` files; here
parameters are flat-keyed safetensors (framework-neutral, mmap-able, no
pickle). A flax variable pytree {'params': ..., 'batch_stats': ...} maps to
keys like "params/BiLSTM_0/RNN_0/.../kernel".

Also includes a torch-state-dict converter hook so pretrained PP-OCR-family
weights can be dropped in when assets become available (torch CPU is
installed for exactly this oracle/converter role, SURVEY.md §7 step 3).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from safetensors import safe_open
from safetensors.numpy import save_file

SEP = "/"
_META_PREFIX = "__meta__"


def _flatten(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{SEP}{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(_flatten(v, key))
        else:
            # ascontiguousarray matters: np.asarray of a jax array can be a
            # non-C-contiguous view (XLA picks device layouts), and
            # safetensors writes raw bytes assuming C order — without the
            # copy, transposed-layout params get silently saved transposed.
            out[key] = np.ascontiguousarray(np.asarray(v))
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_variables(path: str, variables: Mapping[str, Any],
                   metadata: Dict[str, str] = None) -> None:
    """Save a flax variables pytree to one safetensors file."""
    flat = _flatten(variables)
    meta = {k: str(v) for k, v in (metadata or {}).items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file(flat, path, metadata=meta)


def load_variables(path: str, dtype: jnp.dtype = None) -> Dict[str, Any]:
    """Load a safetensors file back into a nested variables pytree."""
    flat: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="numpy") as f:
        for key in f.keys():
            flat[key] = f.get_tensor(key)
    tree = _unflatten(flat)
    if dtype is not None:
        tree = jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)
    else:
        tree = jax.tree.map(jnp.asarray, tree)
    return tree


def load_metadata(path: str) -> Dict[str, str]:
    with safe_open(path, framework="numpy") as f:
        return dict(f.metadata() or {})


def save_charset_sidecar(weights_path: str, charset) -> str:
    """Write the charset next to the weights (reference keeps a dict file
    beside the recognizer weights, SURVEY.md §2.1 R6)."""
    p = os.path.splitext(weights_path)[0] + ".charset.txt"
    charset.to_file(p)
    return p


# ---------------------------------------------------------------------------
# Torch converter (oracle path; torch is CPU-only here)
# ---------------------------------------------------------------------------

def torch_state_dict_to_flat(state_dict, transpose_linear: bool = True
                             ) -> Dict[str, np.ndarray]:
    """Torch state dict → flat numpy dict with JAX conventions.

    Conv weights OIHW → HWIO; linear weights (out, in) → (in, out). Key
    mapping onto a specific flax module tree is model-specific and done by
    the caller; this handles only the universal layout differences.
    """
    out: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        a = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if a.ndim == 4:  # conv OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 2 and transpose_linear:
            a = a.T
        out[k] = np.ascontiguousarray(a)
    return out
