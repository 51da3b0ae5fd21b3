"""Train the flagship CRNN on synthetic text and write assets/rec.safetensors.

Runs on whatever jax's default platform is (the real TPU under the driver's
axon env; pass --cpu to force local CPU). Produces the checked-in toy weights
that make string-level tests and the CLI meaningful (SURVEY.md §7 step 3 —
no pretrained checkpoints or datasets exist in this offline environment).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CONFUSABLE = "Il|1iO0osScCzZxXvVwW_"


def _char_weights(args):
    w = {}
    if args.confusable_bias != 1.0:
        w = {c: args.confusable_bias for c in CONFUSABLE}
    if args.l_bias != 1.0:
        w["l"] = w.get("l", 1.0) * args.l_bias
    return w or None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--max-len", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--finetune", action="store_true",
                    help="warm-start from the shipped assets/rec.safetensors")
    ap.add_argument("--finetune-from", default=None, metavar="PATH",
                    help="warm-start from an arbitrary rec safetensors file")
    ap.add_argument("--rec-height", type=int, default=32,
                    help="strip height of the trained model")
    ap.add_argument("--hidden", type=int, default=160,
                    help="BiLSTM hidden size of the trained model")
    ap.add_argument("--channels", default="32,64,128,256",
                    help="conv channel progression, comma-separated")
    ap.add_argument("--p-space", type=float, default=0.0,
                    help="per-char space probability in synthetic text")
    ap.add_argument("--aug-rotation", type=float, default=0.0,
                    help="rotate half the synthetic strips by +-DEG")
    ap.add_argument("--ckpt-dir", default=None,
                    help="checkpoint/resume dir: reruns continue from the "
                         "latest step (survives bounded run windows)")
    ap.add_argument("--quantize-p", type=float, default=0.0,
                    help="prob of the 4-bit dither transport round-trip "
                         "per training strip (match upload_bits=4 serving)")
    ap.add_argument("--stretch", type=float, default=0.0,
                    help="width-rescale half the strips by a log-uniform "
                         "factor in [1/(1+S), 1+S] — the ink-refinement "
                         "aspect distortion (synth.make_line_batch)")
    ap.add_argument("--p-word", type=float, default=0.0,
                    help="prob of word-like text (lowercase runs joined by "
                         "'_'/' '/'-'/'.') per synthetic line")
    ap.add_argument("--confusable-bias", type=float, default=1.0,
                    help="sampling weight of the confusable glyph clusters "
                         "(Il|1i O0o sS cC zZ xX vV wW _) relative to other "
                         "chars — concentrates training on the measured "
                         "e2e miss classes")
    ap.add_argument("--font-bias", default=None, metavar="NAME:W[,NAME:W]",
                    help="per-font sampling weight multipliers, matched as "
                         "basename substrings (pass 'DejaVuSans.ttf:4' for "
                         "the exact regular face — 'DejaVuSans' alone also "
                         "matches Mono/Bold). Unmatched fonts keep weight 1. "
                         "Targets the measured weak face (DESIGN.md §4 "
                         "per-font breakdown) instead of uniform sampling")
    ap.add_argument("--l-bias", type=float, default=1.0,
                    help="sampling weight of 'l' relative to other chars "
                         "(sets the prior for the ambiguous l/I stroke)")
    ap.add_argument("--font-anneal-frac", type=float, default=0.0,
                    help="switch --font-bias back to uniform fonts for the "
                         "final FRAC of steps (the gentle-bias recipe, "
                         "DESIGN.md §4: bias early, re-balance before the "
                         "weights freeze)")
    ap.add_argument("--degrade", type=float, default=0.0,
                    help="probability of scan-degradation augmentation per "
                         "synthetic strip (blur/noise/JPEG/contrast/"
                         "illumination — synth.degrade_image)")
    ap.add_argument("--degrade-anneal-frac", type=float, default=0.0,
                    help="drop --degrade to 0 for the final fraction of "
                         "steps (clean re-sharpening phase, mirrors "
                         "--font-anneal-frac)")
    ap.add_argument("--det-rotation", type=float, default=0.0,
                    help="per-line rotation range of det-crop pages")
    ap.add_argument("--mix-det-crops", type=int, default=0, metavar="PAGES",
                    help="render PAGES pages, run the real detection+refined"
                         "-warp path, and mix the resulting gt-labeled crops "
                         "into training 50/50 (serving-distribution data)")
    ap.add_argument("--flat-snap", type=float, default=0.0,
                    help="probability of the serving flat-band geometry "
                         "augmentation per eligible strip "
                         "(synth.flat_snap_strip; train/serve consistency "
                         "for rec_flat_band_frac, DESIGN.md 4f)")
    ap.add_argument("--ent-reg", type=float, default=0.0,
                    help="frame-entropy maximization weight (soft "
                         "posteriors for beam/rescoring — DESIGN.md §4h)")
    ap.add_argument("--mesh", default=None, metavar="DP[,TP]",
                    help="train the SAME step dp(+tp)-sharded over a device "
                         "mesh (parallel.mesh): '8' = 8-way data parallel, "
                         "'4,2' = dp=4 x tp=2. Requires dp*tp devices "
                         "(virtual CPU devices work via "
                         "XLA_FLAGS=--xla_force_host_platform_device_count)")
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
    from ocrjax.train.rec_trainer import train_rec

    font_weights = None
    if args.font_bias:
        from ocrjax.train import synth
        font_weights = [1.0] * len(synth.FONTS)
        for spec in args.font_bias.split(","):
            if ":" not in spec:
                raise SystemExit(
                    f"--font-bias: expected NAME:WEIGHT, got {spec!r}")
            name, w = spec.rsplit(":", 1)
            hit = [i for i, f in enumerate(synth.FONTS)
                   if name in os.path.basename(f)]
            if not hit:
                raise SystemExit(f"--font-bias: no font matches {name!r}")
            for i in hit:
                font_weights[i] *= float(w)
        print("font weights:", {os.path.basename(f): round(w, 2)
                                for f, w in zip(synth.FONTS, font_weights)},
              flush=True)

    # Flagship "small" config: real two-stage production models are compact
    # (PP-OCR class); this keeps checked-in assets under ~10 MB while leaving
    # the MXU path (bf16 convs + LSTM matmuls) representative.
    config = OcrConfig(
        rec_hidden=args.hidden,
        rec_height=args.rec_height,
        rec_conv_channels=tuple(int(c) for c in args.channels.split(",")),
    )
    if args.rec_height != 32:
        # scale the width buckets with the strip height (aspect-preserving)
        k = args.rec_height / 32.0
        config = config.replace(rec_width_buckets=tuple(
            int(round(b * k / 32)) * 32 for b in config.rec_width_buckets))
    charset = default_charset()

    assets_p = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "rec.safetensors")
    out = args.out or assets_p

    init_variables = None
    if args.finetune or args.finetune_from:
        src = args.finetune_from or assets_p
        init_variables = W.load_variables(src)
        print("warm-starting from", src, flush=True)

    det_crops = None
    if args.mix_det_crops:
        from ocrjax.api import OcrEngine
        from ocrjax.train.det_crops import generate_det_crops

        eng = OcrEngine.from_pretrained()
        # det crops must match the TRAINED model's strip geometry (the
        # engine's own rec weights are unused here — detection + warp only)
        eng.config = eng.config.replace(
            rec_height=config.rec_height,
            rec_width_buckets=config.rec_width_buckets)
        det_crops = generate_det_crops(
            eng, n_pages=args.mix_det_crops, width=args.width,
            max_rotation=args.det_rotation, p_word=args.p_word)
        print(f"det crops: {det_crops.images.shape[0]} strips from "
              f"{args.mix_det_crops} pages", flush=True)

    mesh = None
    if args.mesh:
        from ocrjax.parallel import mesh as M
        parts = [int(v) for v in args.mesh.split(",")]
        n_dp, n_tp = (parts + [1])[:2]
        mesh = M.make_mesh(n_dp=n_dp, n_tp=n_tp)
        print(f"mesh: {dict(mesh.shape)}", flush=True)
        if args.batch % n_dp:
            raise SystemExit(f"--batch {args.batch} must divide dp={n_dp}")

    result = train_rec(
        config=config, charset=charset, steps=args.steps,
        batch_size=args.batch, width=args.width, lr=args.lr,
        mesh=mesh,
        ent_reg=args.ent_reg,
        seed=args.seed, max_len=args.max_len,
        log=lambda m: print(m, flush=True),
        init_variables=init_variables,
        ckpt_dir=args.ckpt_dir,
        det_crops=det_crops,
        p_space=args.p_space,
        aug_rotation=args.aug_rotation,
        quantize_p=args.quantize_p,
        p_word=args.p_word,
        stretch=args.stretch,
        char_weights=_char_weights(args),
        font_weights=font_weights,
        font_anneal_frac=args.font_anneal_frac,
        degrade=args.degrade,
        degrade_anneal_frac=args.degrade_anneal_frac,
        flat_snap=args.flat_snap,
    )
    cfg_json = json.dumps({
        "rec_hidden": config.rec_hidden,
        "rec_height": config.rec_height,
        "rec_width_buckets": list(config.rec_width_buckets),
        "rec_conv_channels": list(config.rec_conv_channels),
    })
    W.save_variables(out, result.variables, metadata={
        "kind": "crnn",
        "config": cfg_json,
        "exact_match": f"{result.exact_match:.4f}",
        "steps": str(args.steps),
    })
    W.save_charset_sidecar(out, charset)
    print("saved", out, "exact_match", result.exact_match, flush=True)


if __name__ == "__main__":
    main()
