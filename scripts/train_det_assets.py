"""Train the flagship DB detector on synthetic pages → assets/det.safetensors.

Run on the TPU (default platform under the driver env); --cpu forces local.
SURVEY.md §7 step 4 — no pretrained checkpoints exist offline, so detection
weights are produced here.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--p-word", type=float, default=0.0,
                    help="prob of word-like lines (synth.word_text) per "
                         "page line: kernel continuity across '_' joins")
    ap.add_argument("--finetune", action="store_true",
                    help="warm-start from the shipped assets/det.safetensors")
    ap.add_argument("--ckpt-dir", default=None,
                    help="checkpoint/resume dir for bounded run windows")
    ap.add_argument("--head-stride", type=int, default=1, choices=(1, 2, 4),
                    help="det head output stride (4 = detect on the FPN's "
                         "native S/4 grid; ~30%% faster det forward)")
    ap.add_argument("--degrade", type=float, default=0.0,
                    help="probability of scan-degradation augmentation per "
                         "training page (synth.degrade_image — GT maps stay "
                         "exact; the clean-trained detector collapses to "
                         "0.54 recall on degraded pages)")
    ap.add_argument("--arch", default=None, choices=(None, "flagship", "tile"),
                    help="architecture preset (models.db.DB_ARCHS); 'tile' "
                         "trains the cheap tile-scale detector and defaults "
                         "--out to assets/det_tile.safetensors")
    ap.add_argument("--mesh", default=None, metavar="DP[,TP]",
                    help="run the train step over an N-chip DP[,TP] device mesh (parallel.mesh): '8' = 8-way data parallel, '4,2' = dp=4 x tp=2. On 1 real chip use the CPU-mesh trick (XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu) to validate sharding.")
    ap.add_argument("--p-dense", type=float, default=0.0,
                    help="probability of a DENSE page layout per training "
                         "page (synth.render_page_dense — the C5 hundreds-"
                         "of-lines distribution)")
    args = ap.parse_args()

    import jax
    # persistent compile cache: the detection/CRNN graphs take minutes to
    # compile through the remote-TPU tunnel; repeated training runs skip it
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices(), flush=True)

    from ocrjax import weights as W
    from ocrjax.charset import default_charset
    from ocrjax.config import OcrConfig
    from ocrjax.train.det_trainer import train_det

    config = OcrConfig(det_head_stride=args.head_stride)
    arch = None
    asset_name = "det.safetensors"
    if args.arch:
        from ocrjax.models.db import DB_ARCHS
        arch = dict(DB_ARCHS[args.arch])
        if args.arch != "flagship":
            asset_name = f"det_{args.arch}.safetensors"
    init_variables = None
    out_default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", asset_name)
    if args.finetune:
        init_variables = W.load_variables(out_default)
        print("warm-starting from", out_default, flush=True)
    mesh = None
    if args.mesh:
        from ocrjax.parallel import mesh as M
        parts = [int(v) for v in args.mesh.split(",")]
        n_dp, n_tp = parts[0], (parts[1] if len(parts) > 1 else 1)
        mesh = M.make_mesh(n_dp=n_dp, n_tp=n_tp)
        print(f"mesh: {dict(mesh.shape)}", flush=True)
    result = train_det(
        config=config, charset=default_charset(), steps=args.steps,
        batch_size=args.batch, size=args.size, lr=args.lr, seed=args.seed,
        log=lambda m: print(m, flush=True),
        p_word=args.p_word, init_variables=init_variables,
        ckpt_dir=args.ckpt_dir,
        degrade=args.degrade, p_dense=args.p_dense, arch=arch, mesh=mesh,
    )
    out = args.out or out_default
    import json
    meta = {
        "kind": "db",
        "recall": f"{result.recall:.4f}",
        "precision": f"{result.precision:.4f}",
        "steps": str(args.steps),
        "config": json.dumps({"det_head_stride": args.head_stride}),
    }
    if arch is not None:
        # variant assets carry their full architecture so the engine can
        # rebuild the exact model (api._from_pretrained / tiling)
        meta["arch"] = json.dumps(arch)
        meta["config"] = json.dumps(
            {"det_head_stride": int(arch.get("head_stride", 1))})
    W.save_variables(out, result.variables, metadata=meta)
    print("saved", out, "recall", result.recall, "precision",
          result.precision, flush=True)


if __name__ == "__main__":
    main()
