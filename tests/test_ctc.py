"""CTC decode vs NumPy oracles (SURVEY.md §4.2 'Unit (pure, CPU-jax)')."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrjax.ops.ctc import ctc_greedy_decode, ctc_beam_decode, ctc_loss


# ---------------------------------------------------------------------------
# Oracles (host, scalar loops — intentionally the "reference-style" algorithm)
# ---------------------------------------------------------------------------

def greedy_oracle(logits, length, blank=0):
    ids = np.argmax(logits[:length], axis=-1)
    out, prev = [], -1
    for i in ids:
        if i != blank and i != prev:
            out.append(int(i))
        prev = i
    return out


def beam_oracle(logits, length, blank=0, beam_width=8):
    """Classic prefix beam search over log-softmax scores (host loop)."""
    logp = logits[:length] - np.max(logits[:length], -1, keepdims=True)
    logp = logp - np.log(np.sum(np.exp(logp), -1, keepdims=True))
    NEG = -1e30

    def lse(a, b):
        if a <= NEG / 2:
            return b
        if b <= NEG / 2:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    beams = {(): (0.0, NEG)}  # prefix -> (p_blank, p_nonblank)
    V = logits.shape[-1]
    for t in range(logp.shape[0]):
        new = {}
        for prefix, (pb, pnb) in beams.items():
            ptot = lse(pb, pnb)
            # blank
            e = new.get(prefix, (NEG, NEG))
            new[prefix] = (lse(e[0], ptot + logp[t, blank]), e[1])
            # repeat last char without gap
            if prefix:
                c = prefix[-1]
                e = new.get(prefix, (NEG, NEG))
                new[prefix] = (e[0], lse(e[1], pnb + logp[t, c]))
            for c in range(V):
                if c == blank:
                    continue
                np_prefix = prefix + (c,)
                base = pb if (prefix and c == prefix[-1]) else ptot
                e = new.get(np_prefix, (NEG, NEG))
                new[np_prefix] = (e[0], lse(e[1], base + logp[t, c]))
        beams = dict(
            sorted(new.items(), key=lambda kv: -lse(*kv[1]))[:beam_width])
    best = max(beams.items(), key=lambda kv: lse(*kv[1]))
    return list(best[0])


# ---------------------------------------------------------------------------
# Greedy
# ---------------------------------------------------------------------------

def test_greedy_simple_collapse():
    # T=6, C=3: ids = [1,1,0,2,2,1] -> collapse -> [1,2,1]
    ids = np.array([1, 1, 0, 2, 2, 1])
    logits = np.full((1, 6, 3), -5.0, np.float32)
    logits[0, np.arange(6), ids] = 5.0
    toks, n, conf = ctc_greedy_decode(
        jnp.asarray(logits), jnp.array([6]), max_tokens=8)
    assert list(np.asarray(toks)[0][: int(n[0])]) == [1, 2, 1]
    assert float(conf[0]) > 0.9


def test_greedy_respects_length():
    ids = np.array([1, 2, 1, 2])
    logits = np.full((1, 4, 3), -5.0, np.float32)
    logits[0, np.arange(4), ids] = 5.0
    toks, n, _ = ctc_greedy_decode(jnp.asarray(logits), jnp.array([2]), max_tokens=8)
    assert list(np.asarray(toks)[0][: int(n[0])]) == [1, 2]


def test_greedy_empty_output():
    logits = np.full((1, 5, 3), -5.0, np.float32)
    logits[..., 0] = 5.0  # all blank
    toks, n, conf = ctc_greedy_decode(jnp.asarray(logits), jnp.array([5]), max_tokens=8)
    assert int(n[0]) == 0
    assert float(conf[0]) == 1.0


def test_greedy_overflow_truncates():
    # alternating 1,2 -> 10 tokens, max_tokens=4
    ids = np.tile([1, 2], 5)
    logits = np.full((1, 10, 3), -5.0, np.float32)
    logits[0, np.arange(10), ids] = 5.0
    toks, n, _ = ctc_greedy_decode(jnp.asarray(logits), jnp.array([10]), max_tokens=4)
    assert int(n[0]) == 4
    assert list(np.asarray(toks)[0]) == [1, 2, 1, 2]


@pytest.mark.parametrize("seed", range(4))
def test_greedy_matches_oracle_random(seed):
    rng = np.random.RandomState(seed)
    B, T, C = 5, 37, 12
    logits = rng.randn(B, T, C).astype(np.float32) * 3
    lengths = rng.randint(1, T + 1, size=(B,))
    toks, n, _ = ctc_greedy_decode(
        jnp.asarray(logits), jnp.asarray(lengths), max_tokens=T)
    toks, n = np.asarray(toks), np.asarray(n)
    for b in range(B):
        assert list(toks[b][: n[b]]) == greedy_oracle(logits[b], lengths[b]), b


# ---------------------------------------------------------------------------
# Beam
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(3))
def test_beam_matches_oracle_random(seed):
    rng = np.random.RandomState(100 + seed)
    B, T, C, K = 3, 12, 6, 8
    logits = rng.randn(B, T, C).astype(np.float32) * 2
    lengths = rng.randint(3, T + 1, size=(B,))
    toks, n, _ = ctc_beam_decode(
        jnp.asarray(logits), jnp.asarray(lengths),
        max_tokens=T, beam_width=K)
    toks, n = np.asarray(toks), np.asarray(n)
    for b in range(B):
        want = beam_oracle(logits[b], lengths[b], beam_width=K)
        assert list(toks[b][: n[b]]) == want, b


def test_beam_on_peaked_logits_equals_greedy():
    ids = np.array([1, 1, 0, 2, 0, 3, 3])
    logits = np.full((1, 7, 5), -8.0, np.float32)
    logits[0, np.arange(7), ids] = 8.0
    toks, n, _ = ctc_beam_decode(jnp.asarray(logits), jnp.array([7]),
                                 max_tokens=8, beam_width=4)
    assert list(np.asarray(toks)[0][: int(n[0])]) == [1, 2, 3]


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------

def test_ctc_loss_decreases_on_target():
    # Loss of logits aligned with the target should be far below random.
    B, T, C = 2, 10, 5
    labels = np.zeros((B, 4), np.int32)
    labels[:, :3] = [[1, 2, 3], [2, 3, 4]]
    label_lengths = np.array([3, 3], np.int32)
    aligned = np.full((B, T, C), -5.0, np.float32)
    for b in range(B):
        seq = [labels[b, 0]] * 3 + [0] + [labels[b, 1]] * 3 + [labels[b, 2]] * 3
        for t, c in enumerate(seq):
            aligned[b, t, c] = 5.0
    rand = np.random.RandomState(0).randn(B, T, C).astype(np.float32)
    ll = jnp.array([T, T])
    l_aligned = float(ctc_loss(jnp.asarray(aligned), ll,
                               jnp.asarray(labels), jnp.asarray(label_lengths)))
    l_rand = float(ctc_loss(jnp.asarray(rand), ll,
                            jnp.asarray(labels), jnp.asarray(label_lengths)))
    assert l_aligned < 0.5 < l_rand


def test_ctc_loss_grad_finite():
    B, T, C = 2, 8, 5
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    labels = jnp.asarray(np.array([[1, 2, 0], [3, 4, 0]], np.int32))
    g = jax.grad(lambda lg: ctc_loss(lg, jnp.array([T, T]), labels,
                                     jnp.array([2, 2])))(logits)
    assert np.all(np.isfinite(np.asarray(g)))


def test_ctc_loss_matches_torch_oracle():
    """SURVEY.md §4.2: our CTC loss (optax alpha recursion) vs the installed
    CPU torch's F.ctc_loss on random batches — same per-sequence NLL."""
    import torch
    import torch.nn.functional as TF

    from ocrjax.ops.ctc import ctc_loss

    rng = np.random.RandomState(0)
    B, T, C, U = 4, 17, 9, 6
    logits = rng.randn(B, T, C).astype(np.float32)
    logit_lengths = np.asarray([17, 15, 12, 9], np.int32)
    label_lengths = np.asarray([6, 4, 3, 1], np.int32)
    labels = np.zeros((B, U), np.int32)
    for b in range(B):
        labels[b, : label_lengths[b]] = rng.randint(
            1, C, size=label_lengths[b])

    ours = float(ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lengths),
                          jnp.asarray(labels), jnp.asarray(label_lengths)))

    log_probs = TF.log_softmax(
        torch.from_numpy(logits), dim=-1).transpose(0, 1)  # (T, B, C)
    want = TF.ctc_loss(
        log_probs, torch.from_numpy(labels),
        torch.from_numpy(logit_lengths.astype(np.int64)),
        torch.from_numpy(label_lengths.astype(np.int64)),
        blank=0, reduction="none")  # per-seq NLL (not length-normalized)
    np.testing.assert_allclose(ours, float(want.mean()), rtol=1e-4)


@pytest.mark.parametrize("seed", range(2))
def test_beam_matches_oracle_production_scale(seed):
    """Production shapes (VERDICT r1 #7): vocab ≈ charset size (96+blank),
    T ≈ 320px strip (80 frames). The exact prefix-identity merge must agree
    with the host oracle — the old rolling-hash merge was only ever tested
    at V≤6, T≤12 where collisions could not arise."""
    rng = np.random.RandomState(500 + seed)
    B, T, C, K = 2, 80, 97, 8
    logits = rng.randn(B, T, C).astype(np.float32) * 4
    lengths = np.asarray([80, 61])
    toks, n, _ = ctc_beam_decode(
        jnp.asarray(logits), jnp.asarray(lengths),
        max_tokens=128, beam_width=K)
    toks, n = np.asarray(toks), np.asarray(n)
    for b in range(B):
        want = beam_oracle(logits[b], lengths[b], beam_width=K)
        assert list(toks[b][: n[b]]) == want, b


def test_beam_merge_heavy_ambiguity():
    """Merge-stress regression: mass concentrated on {blank, a, b} over many
    frames maximizes stay×extend prefix joins — the regime where a hash
    collision (or a wrong identity rule) silently corrupts the search."""
    rng = np.random.RandomState(7)
    B, T, C, K = 1, 40, 97, 8
    logits = np.full((B, T, C), -9.0, np.float32)
    # random near-uniform competition between blank(0), 'a'(1), 'b'(2)
    logits[:, :, :3] = rng.randn(B, T, 3).astype(np.float32) * 0.7
    lengths = np.asarray([T])
    toks, n, _ = ctc_beam_decode(
        jnp.asarray(logits), jnp.asarray(lengths),
        max_tokens=64, beam_width=K)
    want = beam_oracle(logits[0], T, beam_width=K)
    assert list(np.asarray(toks)[0][: int(n[0])]) == want
