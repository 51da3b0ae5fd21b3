"""Linear weight soup of two compatible safetensors checkpoints.

Model soups (interpolating the weights of fine-tunes that share a common
parent) often recover the parent's strengths while keeping the fine-tune's
gains — here used to blend the shipped rec weights (strong on clean
straight text) with a degradation-robust fine-tune candidate, instead of
picking one point on the robustness/clean trade-off.

Usage:
  python scripts/soup_weights.py A.safetensors B.safetensors OUT.safetensors \
      --alpha 0.5   # OUT = (1-alpha)*A + alpha*B

Both checkpoints must come from the same architecture (identical key sets
and shapes); metadata is taken from B (the candidate) with a soup note.
"""
import argparse
import json

import numpy as np
from safetensors import safe_open
from safetensors.numpy import save_file


def load_all(path):
    tensors, meta = {}, None
    with safe_open(path, framework="np") as f:
        meta = f.metadata() or {}
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    return tensors, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("out")
    ap.add_argument("--alpha", type=float, default=0.5,
                    help="weight on B: out = (1-alpha)*A + alpha*B")
    args = ap.parse_args()

    ta, _ = load_all(args.a)
    tb, mb = load_all(args.b)
    if set(ta) != set(tb):
        raise SystemExit("key mismatch: %s" % (set(ta) ^ set(tb)))
    out = {}
    for k in ta:
        if ta[k].shape != tb[k].shape:
            raise SystemExit("shape mismatch at %s: %s vs %s"
                             % (k, ta[k].shape, tb[k].shape))
        a32 = ta[k].astype(np.float64)
        b32 = tb[k].astype(np.float64)
        out[k] = ((1.0 - args.alpha) * a32 + args.alpha * b32).astype(ta[k].dtype)
    mb = dict(mb)
    mb["soup"] = json.dumps({"a": args.a, "b": args.b, "alpha": args.alpha})
    save_file(out, args.out, metadata=mb)
    print("wrote %s (%d tensors, alpha=%.2f on %s)"
          % (args.out, len(out), args.alpha, args.b))


if __name__ == "__main__":
    main()
