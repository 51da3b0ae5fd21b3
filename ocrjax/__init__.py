"""ocrjax — a TPU-native two-stage OCR framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
`lazareviczoran/ocr-rs` pipeline (see /root/repo/SURVEY.md for the full
blueprint; the reference mount was empty this round, so citations point at
SURVEY.md sections / BASELINE.json lines rather than reference file:line).

Two stages:
  * Detection  — DB-style (Differentiable Binarization) text detector:
    conv+BN+ReLU backbone, FPN neck, probability-map head
    (SURVEY.md §1.1 item 1 / BASELINE.json:5).
  * Recognition — CRNN: conv feature extractor, BiLSTM encoder, CTC head,
    with *batched on-device* greedy/beam CTC decode
    (SURVEY.md §1.1 item 2 / BASELINE.json:5).

Public API mirrors the reference's `detect` / `recognize` / `ocr`
(SURVEY.md §2.1 R9), plus batched variants (C4) and tiled high-res
documents (C5).
"""

from ocrjax.config import OcrConfig
from ocrjax.charset import Charset

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: pulling in the full pipeline (models, jit graphs) only when the
    # public API is actually used keeps `import ocrjax` cheap for tooling.
    if name in ("OcrEngine", "detect", "recognize", "ocr"):
        from ocrjax import api

        return getattr(api, name)
    raise AttributeError(f"module 'ocrjax' has no attribute {name!r}")

__all__ = [
    "OcrConfig",
    "Charset",
    "OcrEngine",
    "detect",
    "recognize",
    "ocr",
    "__version__",
]
