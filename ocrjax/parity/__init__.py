"""Torch-twin golden-parity harness (SURVEY.md §4.2 "Golden parity (a)").

The reference's correctness bar is "bit-comparable boxes and identical
decoded strings" (BASELINE.json:5). With the reference mount empty
(SURVEY.md §0), the offline-buildable proxy is a torch-CPU reimplementation
of both models that shares weights with the flax models through the
completed ocrjax.weights key mapping; tests assert logit/prob-map closeness,
box IoU and exact decoded-string agreement across the two frameworks.
"""
