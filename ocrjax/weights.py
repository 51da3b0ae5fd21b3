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
    mapping onto a specific flax module tree is model-specific — see
    crnn_variables_from_torch / db_variables_from_torch below; this helper
    handles only the universal layout differences.
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


# ---------------------------------------------------------------------------
# N8 key mapping: CRNN / DB torch checkpoints ↔ flax variable trees
# ---------------------------------------------------------------------------
# The canonical torch module naming is ocrjax.parity.torch_twin (conv0..6,
# bn2/4/6, lstm0/1, fc; backbone.stem*/stages.i.j.*, fpn.lateral/smooth,
# head.conv0/up1/up2). Layout transforms verified numerically in
# tests/test_parity_torch.py:
#   conv    torch (O,I,kh,kw)  ↔ flax (kh,kw,I,O)
#   convT   torch (I,O,kh,kw)  ↔ flax (kh,kw,I,O) + spatial flip (flax
#           lax.conv_transpose does not mirror the kernel the way torch's
#           transposed conv does)
#   linear  torch (O,I)        ↔ flax (I,O)
#   lstm    torch packed (4H,·) gate rows [i,f,g,o] ↔ flax per-gate
#           ii/if/ig/io (input, no bias) + hi/hf/hg/ho (hidden, bias);
#           flax bias = bias_ih + bias_hh

def _t2f(a: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return np.ascontiguousarray(a.transpose(2, 3, 1, 0))
    if kind == "convT":
        return np.ascontiguousarray(a.transpose(2, 3, 0, 1)[::-1, ::-1])
    if kind == "linear":
        return np.ascontiguousarray(a.T)
    return np.ascontiguousarray(a)


def _f2t(a: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return np.ascontiguousarray(a.transpose(3, 2, 0, 1))
    if kind == "convT":
        return np.ascontiguousarray(a[::-1, ::-1].transpose(2, 3, 0, 1))
    if kind == "linear":
        return np.ascontiguousarray(a.T)
    return np.ascontiguousarray(a)


def _bn_entries(flax_mod: str, torch_mod: str):
    return [
        (f"params/{flax_mod}/scale", f"{torch_mod}.weight", "vec"),
        (f"params/{flax_mod}/bias", f"{torch_mod}.bias", "vec"),
        (f"batch_stats/{flax_mod}/mean", f"{torch_mod}.running_mean", "vec"),
        (f"batch_stats/{flax_mod}/var", f"{torch_mod}.running_var", "vec"),
    ]


def _crnn_key_table():
    t = []
    convs = [("ConvBNRelu_0", "conv0", True, None),
             ("ConvBNRelu_1", "conv1", True, None),
             ("ConvBNRelu_2", "conv2", False, "bn2"),
             ("ConvBNRelu_3", "conv3", True, None),
             ("ConvBNRelu_4", "conv4", False, "bn4"),
             ("ConvBNRelu_5", "conv5", True, None),
             ("ConvBNRelu_6", "conv6", False, "bn6")]
    for fl, tc, bias, bn in convs:
        t.append((f"params/{fl}/Conv_0/kernel", f"{tc}.weight", "conv"))
        if bias:
            t.append((f"params/{fl}/Conv_0/bias", f"{tc}.bias", "vec"))
        if bn:
            t += _bn_entries(f"{fl}/BatchNorm_0", bn)
    t.append(("params/Dense_0/kernel", "fc.weight", "linear"))
    t.append(("params/Dense_0/bias", "fc.bias", "vec"))
    return t


def _db_key_table(channels=(64, 128, 256, 512), blocks_per_stage=2):
    t = []
    for fl, tc, bn in [("ConvBNRelu_0", "stem0", "bn_s0"),
                       ("ConvBNRelu_1", "stem1", "bn_s1")]:
        t.append((f"params/Backbone_0/{fl}/Conv_0/kernel",
                  f"backbone.{tc}.weight", "conv"))
        t += _bn_entries(f"Backbone_0/{fl}/BatchNorm_0", f"backbone.{bn}")
    k = 0
    cin = channels[0]
    for i, ch in enumerate(channels):
        for j in range(blocks_per_stage):
            fl = f"Backbone_0/ResBlock_{k}"
            tp = f"backbone.stages.{i}.{j}"
            stride_one = (i == 0) or (j > 0)
            t.append((f"params/{fl}/ConvBNRelu_0/Conv_0/kernel",
                      f"{tp}.conv1.weight", "conv"))
            t += _bn_entries(f"{fl}/ConvBNRelu_0/BatchNorm_0", f"{tp}.bn1")
            t.append((f"params/{fl}/Conv_0/kernel",
                      f"{tp}.conv2.weight", "conv"))
            t += _bn_entries(f"{fl}/BatchNorm_0", f"{tp}.bn2")
            if cin != ch or not stride_one:
                t.append((f"params/{fl}/Conv_1/kernel",
                          f"{tp}.conv_p.weight", "conv"))
                t += _bn_entries(f"{fl}/BatchNorm_1", f"{tp}.bn_p")
            cin = ch
            k += 1
    for i in range(len(channels)):
        t.append((f"params/FPN_0/Conv_{i}/kernel",
                  f"fpn.lateral.{i}.weight", "conv"))
    for i in range(len(channels)):
        t.append((f"params/FPN_0/Conv_{len(channels) + i}/kernel",
                  f"fpn.smooth.{i}.weight", "conv"))
    # prob head (DBHead_0). The thresh head (DBHead_1) is train-only; at
    # conversion time it mirrors the prob head unless thresh_head.* keys
    # exist in the torch checkpoint.
    for fh, th in [("DBHead_0", "head"), ("DBHead_1", "thresh_head")]:
        t.append((f"params/{fh}/ConvBNRelu_0/Conv_0/kernel",
                  f"{th}.conv0.weight", "conv"))
        t += _bn_entries(f"{fh}/ConvBNRelu_0/BatchNorm_0", f"{th}.bn0")
        t.append((f"params/{fh}/ConvTranspose_0/kernel",
                  f"{th}.up1.weight", "convT"))
        t.append((f"params/{fh}/ConvTranspose_0/bias",
                  f"{th}.up1.bias", "vec"))
        t += _bn_entries(f"{fh}/BatchNorm_0", f"{th}.bn1")
        t.append((f"params/{fh}/ConvTranspose_1/kernel",
                  f"{th}.up2.weight", "convT"))
        t.append((f"params/{fh}/ConvTranspose_1/bias",
                  f"{th}.up2.bias", "vec"))
    return t


def _np(v) -> np.ndarray:
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      dtype=np.float32)


_GATES = ("i", "f", "g", "o")


def _lstm_t2f(flat: Dict[str, np.ndarray], sd: Mapping, flax_cell: str,
              prefix: str, reverse: bool) -> None:
    """One torch LSTM direction → one flax OptimizedLSTMCell subtree."""
    names = ([f"{prefix}.weight_ih_l0_reverse", f"{prefix}.weight_hh_l0_reverse",
              f"{prefix}.bias_ih_l0_reverse", f"{prefix}.bias_hh_l0_reverse"]
             if reverse else
             [f"{prefix}.weight_ih_l0", f"{prefix}.weight_hh_l0",
              f"{prefix}.bias_ih_l0", f"{prefix}.bias_hh_l0"])
    if names[0] not in sd:  # twin naming: separate fwd/bwd LSTM modules
        sub = f"{prefix}.bwd" if reverse else f"{prefix}.fwd"
        names = [f"{sub}.weight_ih_l0", f"{sub}.weight_hh_l0",
                 f"{sub}.bias_ih_l0", f"{sub}.bias_hh_l0"]
    wi, wh, bi, bh = (_np(sd[n]) for n in names)
    H = wh.shape[1]
    b = bi + bh
    for gi, g in enumerate(_GATES):
        flat[f"{flax_cell}/i{g}/kernel"] = \
            np.ascontiguousarray(wi[gi * H:(gi + 1) * H].T)
        flat[f"{flax_cell}/h{g}/kernel"] = \
            np.ascontiguousarray(wh[gi * H:(gi + 1) * H].T)
        flat[f"{flax_cell}/h{g}/bias"] = \
            np.ascontiguousarray(b[gi * H:(gi + 1) * H])


def _lstm_f2t(sd: Dict[str, np.ndarray], flat: Mapping, flax_cell: str,
              prefix: str, reverse: bool, twin_naming: bool) -> None:
    wi = np.concatenate(
        [np.asarray(flat[f"{flax_cell}/i{g}/kernel"]).T for g in _GATES], 0)
    wh = np.concatenate(
        [np.asarray(flat[f"{flax_cell}/h{g}/kernel"]).T for g in _GATES], 0)
    bh = np.concatenate(
        [np.asarray(flat[f"{flax_cell}/h{g}/bias"]) for g in _GATES], 0)
    if twin_naming:
        sub = f"{prefix}.bwd" if reverse else f"{prefix}.fwd"
        names = [f"{sub}.weight_ih_l0", f"{sub}.weight_hh_l0",
                 f"{sub}.bias_ih_l0", f"{sub}.bias_hh_l0"]
    else:
        suf = "_reverse" if reverse else ""
        names = [f"{prefix}.weight_ih_l0{suf}", f"{prefix}.weight_hh_l0{suf}",
                 f"{prefix}.bias_ih_l0{suf}", f"{prefix}.bias_hh_l0{suf}"]
    sd[names[0]] = np.ascontiguousarray(wi)
    sd[names[1]] = np.ascontiguousarray(wh)
    sd[names[2]] = np.zeros_like(bh)
    sd[names[3]] = np.ascontiguousarray(bh)


def crnn_variables_from_torch(state_dict: Mapping) -> Dict[str, Any]:
    """Torch CRNN checkpoint → flax variables {'params', 'batch_stats'}.

    Accepts both the twin naming (lstm0.fwd.*) and standard bidirectional
    naming (lstm0.weight_ih_l0_reverse). This is the working N8 converter:
    a real torch checkpoint of this architecture drops into the flax model.
    """
    flat: Dict[str, np.ndarray] = {}
    for fk, tk, kind in _crnn_key_table():
        flat[fk] = _t2f(_np(state_dict[tk]), kind)
    for bl, pfx in [("BiLSTM_0", "lstm0"), ("BiLSTM_1", "lstm1")]:
        _lstm_t2f(flat, state_dict, f"params/{bl}/OptimizedLSTMCell_0",
                  pfx, reverse=False)
        _lstm_t2f(flat, state_dict, f"params/{bl}/OptimizedLSTMCell_1",
                  pfx, reverse=True)
    return _unflatten(flat)


def crnn_torch_state_dict(variables: Mapping) -> Dict[str, np.ndarray]:
    """Flax CRNN variables → torch twin state dict (numpy values)."""
    flat = _flatten(variables)
    sd: Dict[str, np.ndarray] = {}
    for fk, tk, kind in _crnn_key_table():
        sd[tk] = _f2t(np.asarray(flat[fk]), kind)
    for bl, pfx in [("BiLSTM_0", "lstm0"), ("BiLSTM_1", "lstm1")]:
        _lstm_f2t(sd, flat, f"params/{bl}/OptimizedLSTMCell_0",
                  pfx, reverse=False, twin_naming=True)
        _lstm_f2t(sd, flat, f"params/{bl}/OptimizedLSTMCell_1",
                  pfx, reverse=True, twin_naming=True)
    return sd


def _cls_key_table(n_convs: int = 3):
    t = []
    for i in range(n_convs):
        t.append((f"params/Conv_{i}/kernel", f"convs.{i}.weight", "conv"))
        t.append((f"params/Conv_{i}/bias", f"convs.{i}.bias", "vec"))
    t.append(("params/Dense_0/kernel", "fc1.weight", "linear"))
    t.append(("params/Dense_0/bias", "fc1.bias", "vec"))
    t.append(("params/Dense_1/kernel", "fc2.weight", "linear"))
    t.append(("params/Dense_1/bias", "fc2.bias", "vec"))
    return t


def cls_variables_from_torch(state_dict: Mapping, n_convs: int = 3
                             ) -> Dict[str, Any]:
    """Torch orientation-classifier checkpoint → flax variables."""
    flat = {fk: _t2f(_np(state_dict[tk]), kind)
            for fk, tk, kind in _cls_key_table(n_convs)}
    return _unflatten(flat)


def cls_torch_state_dict(variables: Mapping, n_convs: int = 3
                         ) -> Dict[str, np.ndarray]:
    """Flax orientation-classifier variables → torch twin state dict."""
    flat = _flatten(variables)
    return {tk: _f2t(np.asarray(flat[fk]), kind)
            for fk, tk, kind in _cls_key_table(n_convs)}


def db_variables_from_torch(state_dict: Mapping,
                            channels=(64, 128, 256, 512),
                            blocks_per_stage: int = 2) -> Dict[str, Any]:
    """Torch DB checkpoint → flax variables. Missing thresh_head.* keys
    (inference-only checkpoints) mirror the prob head — the thresh head
    never runs at inference but the flax tree requires its params."""
    flat: Dict[str, np.ndarray] = {}
    for fk, tk, kind in _db_key_table(channels, blocks_per_stage):
        if tk not in state_dict and tk.startswith("thresh_head."):
            tk = "head." + tk[len("thresh_head."):]
        flat[fk] = _t2f(_np(state_dict[tk]), kind)
    return _unflatten(flat)


def db_torch_state_dict(variables: Mapping, channels=(64, 128, 256, 512),
                        blocks_per_stage: int = 2,
                        include_thresh_head: bool = False
                        ) -> Dict[str, np.ndarray]:
    """Flax DB variables → torch twin state dict (prob head; numpy values)."""
    flat = _flatten(variables)
    sd: Dict[str, np.ndarray] = {}
    for fk, tk, kind in _db_key_table(channels, blocks_per_stage):
        if tk.startswith("thresh_head.") and not include_thresh_head:
            continue
        sd[tk] = _f2t(np.asarray(flat[fk]), kind)
    return sd
