"""Batched on-device CTC decoding (greedy + beam) and CTC loss.

The reference decodes CTC in scalar host loops over each sequence
(SURVEY.md §2.1 R6 / BASELINE.json:5: "CTC greedy/beam decoding runs ...
scalar host loops"). Here decoding is a fixed-shape, fully batched XLA
program that runs on-TPU:

  * greedy: argmax → collapse-repeats/drop-blank via a one-hot matmul
    compaction (MXU-friendly scatter — no host loop, no dynamic shapes);
  * beam: fixed-width CTC prefix beam search kept entirely in fixed-size
    arrays with per-step top-k and exact (collision-free) prefix-identity
    merging (memory-efficient formulation in the spirit of SURVEY.md §7
    "Batched beam-search CTC").

Outputs are fixed-shape (B, max_tokens) id arrays + lengths, so the only
host work left is the final charset lookup (Charset.decode).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax


def _collapse_mask(ids: jnp.ndarray, lengths: jnp.ndarray, blank: int) -> jnp.ndarray:
    """CTC collapse rule as a boolean mask over frames.

    Keep frame t iff: not blank, differs from previous frame's id, and
    t < length. ids: (B, T) int32, lengths: (B,) int32 → (B, T) bool.
    """
    B, T = ids.shape
    prev = jnp.concatenate([jnp.full((B, 1), -1, ids.dtype), ids[:, :-1]], axis=1)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    return (ids != blank) & (ids != prev) & (t_idx < lengths[:, None])


def _compact(ids: jnp.ndarray, keep: jnp.ndarray, max_tokens: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Left-compact the kept ids into a fixed (B, max_tokens) buffer.

    Implemented as a one-hot matmul "scatter": out[b, k] = sum_t
    onehot(pos[b, t] == k) * ids[b, t] over kept frames. This keeps the
    whole decode on the MXU/VPU with static shapes — the TPU-native
    replacement for the reference's per-sequence host loop.
    """
    keep_i = keep.astype(jnp.int32)
    pos = jnp.cumsum(keep_i, axis=1) - 1                      # (B, T)
    # Overflowing tokens (pos >= max_tokens) and dropped frames get pos = -1,
    # which matches no output slot.
    pos = jnp.where(keep & (pos < max_tokens), pos, -1)
    onehot = jax.nn.one_hot(pos, max_tokens, dtype=jnp.float32)  # (B, T, K)
    out = jnp.einsum(
        "btk,bt->bk", onehot, ids.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    n_tokens = jnp.minimum(jnp.sum(keep_i, axis=1), max_tokens)
    return out.astype(jnp.int32), n_tokens


@functools.partial(jax.jit, static_argnames=("blank", "max_tokens"))
def ctc_greedy_decode(
    logits: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    blank: int = 0,
    max_tokens: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched greedy CTC decode, fully on-device.

    Args:
      logits: (B, T, C) unnormalized scores.
      lengths: (B,) valid frame counts (frames >= length are ignored).
      blank: CTC blank id.
      max_tokens: fixed output width.

    Returns:
      tokens: (B, max_tokens) int32, zero-padded character ids.
      n_tokens: (B,) int32 number of valid tokens.
      confidence: (B,) float32 — mean max-softmax prob over the emitted
        (kept) frames; 1.0 for empty outputs.
    """
    logits = logits.astype(jnp.float32)
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)        # (B, T)
    keep = _collapse_mask(ids, lengths, blank)
    tokens, n_tokens = _compact(ids, keep, max_tokens)

    logp = jax.nn.log_softmax(logits, axis=-1)
    frame_conf = jnp.exp(jnp.max(logp, axis=-1))               # (B, T)
    kept = keep.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(kept, axis=1), 1.0)
    confidence = jnp.where(
        jnp.sum(kept, axis=1) > 0,
        jnp.sum(frame_conf * kept, axis=1) / denom,
        1.0,
    )
    return tokens, n_tokens, confidence


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------


def _beam_step(state, inputs, *, beam_width: int, blank: int, vocab: int):
    """One frame of batched CTC prefix beam search.

    Beams are fixed-size arrays; prefix identity for the merge is the EXACT
    (toks, len) buffer comparison — collision-free by construction (an
    earlier design used a uint32 rolling hash, whose collisions across the
    K×V extend set could silently merge distinct prefixes; the exact
    compare costs only O(K²·L) boolean ops per frame and removes the
    failure class). Per beam we track:
      p_b   — log prob of the prefix ending in blank,
      p_nb  — log prob ending in non-blank,
      last  — last emitted token id,
      toks  — (max_tokens,) emitted ids, len — emitted count.
    """
    p_b, p_nb, last, toks, lens = state
    logp, t_valid = inputs                                     # (V,), scalar bool
    K = beam_width
    V = vocab
    NEG = jnp.float32(-1e30)

    def expand():
        p_tot = jnp.logaddexp(p_b, p_nb)                       # (K,)

        # --- candidate 1: stay (emit blank, or repeat last char merged) ----
        stay_pb = p_tot + logp[blank]                          # (K,)
        last_lp = logp[last]                                   # (K,) logp of last char
        stay_pnb = p_nb + last_lp                              # repeat w/o gap
        # staying keeps prefix identity: last/toks/len unchanged.

        # --- candidate 2: extend with char c (c != blank) -------------------
        # extending with c == last requires a preceding blank: from p_b only.
        char_ids = jax.lax.broadcasted_iota(jnp.int32, (K, V), 1)
        ext_base = jnp.where(char_ids == last[:, None],
                             p_b[:, None], p_tot[:, None])     # (K, V)
        ext_pnb = ext_base + logp[None, :]                     # (K, V)
        ext_pnb = jnp.where(char_ids == blank, NEG, ext_pnb)

        # --- merge: only stay×extend collisions are possible ----------------
        # Two extends produce equal prefixes only if their parent beams were
        # equal (excluded by invariant), so the classic O(N^2) prefix merge
        # reduces to matching each extend (parent k, char v) against the K
        # stay beams j. Exact prefix identity: len_j == len_k + 1, the
        # first len_k tokens agree, and stay j's token at slot len_k is v.
        # The extend's mass then flows into the stay's p_nb and the extend
        # is disabled. (Beams whose prefix overflowed the L-token buffer
        # compare by their first L tokens — production L=rec_max_tokens is
        # sized above any reachable sequence length.)
        L = toks.shape[1]
        slot = jax.lax.broadcasted_iota(jnp.int32, (K, L), 1)   # (K, L)
        prefix_mask = slot < lens[:, None]                      # (K, L) of k
        # (k, j): do stay j's first len_k tokens equal parent k's?
        prefix_eq = jnp.all(
            (toks[:, None, :] == toks[None, :, :]) | ~prefix_mask[:, None, :],
            axis=-1)                                            # (K, K)
        len_ok = (lens[:, None] + 1) == lens[None, :]           # (K, K)
        # stay j's token at slot len_k (garbage where len_k >= len_j, but
        # len_ok gates those): (K, K)
        at_lenk = jnp.take_along_axis(
            jnp.broadcast_to(toks[None, :, :], (K, K, L)),
            jnp.clip(lens, 0, L - 1)[:, None, None], axis=2)[..., 0]
        kj_ok = prefix_eq & len_ok                              # (K, K)
        match = (kj_ok[:, None, :]
                 & (at_lenk[:, None, :] == char_ids[..., None]))  # (K, V, K)
        ext_into_stay = jnp.where(
            jnp.reshape(match, (K * V, K)),
            jnp.reshape(ext_pnb, (K * V,))[:, None], NEG)      # (K*V, K)
        stay_pnb = jnp.logaddexp(
            stay_pnb, jax.nn.logsumexp(ext_into_stay, axis=0))
        merged_away = jnp.any(match, axis=2)                   # (K, V)
        ext_pnb = jnp.where(merged_away, NEG, ext_pnb)

        # --- flatten: K stay-candidates + K*V extend-candidates -------------
        cand_score = jnp.concatenate(
            [jnp.logaddexp(stay_pb, stay_pnb), jnp.reshape(ext_pnb, (K * V,))])
        cand_pb = jnp.concatenate([stay_pb, jnp.full((K * V,), NEG)])
        cand_pnb = jnp.concatenate([stay_pnb, jnp.reshape(ext_pnb, (K * V,))])
        cand_last = jnp.concatenate([last, jnp.reshape(char_ids, (K * V,))])
        cand_src = jnp.concatenate([
            jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0).squeeze(-1),
            jnp.reshape(jax.lax.broadcasted_iota(jnp.int32, (K, V), 0), (K * V,)),
        ])
        cand_is_ext = jnp.concatenate(
            [jnp.zeros((K,), jnp.bool_), jnp.ones((K * V,), jnp.bool_)])

        # --- top-K beams ------------------------------------------------------
        top_score, top_i = jax.lax.top_k(cand_score, K)
        n_pb = cand_pb[top_i]
        n_pnb = cand_pnb[top_i]
        n_last = cand_last[top_i]
        src = cand_src[top_i]
        is_ext = cand_is_ext[top_i]

        # --- update token buffers --------------------------------------------
        n_toks = toks[src]                                     # (K, L)
        n_len = lens[src]
        wslot = jax.lax.broadcasted_iota(jnp.int32, (K, L), 1)
        write = is_ext[:, None] & (wslot == n_len[:, None]) & (n_len[:, None] < L)
        n_toks = jnp.where(write, n_last[:, None], n_toks)
        n_len = jnp.where(is_ext & (n_len < L), n_len + 1, n_len)
        return n_pb, n_pnb, n_last, n_toks, n_len

    new_state = jax.lax.cond(
        t_valid, expand, lambda: (p_b, p_nb, last, toks, lens))
    return new_state, None


@functools.partial(
    jax.jit, static_argnames=("blank", "max_tokens", "beam_width"))
def ctc_beam_decode(
    logits: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    blank: int = 0,
    max_tokens: int = 128,
    beam_width: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched fixed-width CTC prefix beam search, fully on-device.

    Same interface as ctc_greedy_decode; returns the best beam per sequence.
    confidence is exp(score / max(n_tokens, 1)) of the winning beam.
    """
    B, T, V = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    K, L = beam_width, max_tokens
    NEG = jnp.float32(-1e30)

    def one_seq(seq_logp, length):
        # init: single empty beam (slot 0), rest disabled (NEG mass; their
        # zero-length prefixes can never satisfy the merge's len_j==len_k+1)
        p_b = jnp.full((K,), NEG).at[0].set(0.0)
        p_nb = jnp.full((K,), NEG)
        last = jnp.full((K,), -1, jnp.int32)
        toks = jnp.zeros((K, L), jnp.int32)
        lens = jnp.zeros((K,), jnp.int32)
        t_valid = (jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0).squeeze(-1)
                   < length)
        step = functools.partial(
            _beam_step, beam_width=K, blank=blank, vocab=V)
        (p_b, p_nb, last, toks, lens), _ = jax.lax.scan(
            step, (p_b, p_nb, last, toks, lens), (seq_logp, t_valid))
        score = jnp.logaddexp(p_b, p_nb)
        best = jnp.argmax(score)
        conf = jnp.exp(score[best] / jnp.maximum(lens[best], 1))
        return toks[best], lens[best], conf

    return jax.vmap(one_seq)(logp, lengths)


# ---------------------------------------------------------------------------
# Loss (training, SURVEY.md §2.3 N11)
# ---------------------------------------------------------------------------

def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    *,
    blank: int = 0,
) -> jnp.ndarray:
    """Mean CTC loss over the batch (wraps optax's alpha-recursion impl).

    logits: (B, T, C); labels: (B, U) int32 padded with blank.
    """
    B, T, _ = logits.shape
    U = labels.shape[1]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    u_idx = jax.lax.broadcasted_iota(jnp.int32, (B, U), 1)
    logit_pad = (t_idx >= logit_lengths[:, None]).astype(jnp.float32)
    label_pad = (u_idx >= label_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32), logit_pad, labels, label_pad,
        blank_id=blank)
    return jnp.mean(per_seq)
