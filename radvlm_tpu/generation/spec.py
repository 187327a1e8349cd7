"""Speculative decoding: device-side prompt-lookup drafts + windowed verify.

Single-request report latency is decode-STEP-count dominated (BASELINE.md "p50
latency per report": fill ~0.4 s, then max_new_tokens sequential ~10 ms steps).
Speculation collapses steps: each engine step verifies spec_k drafted tokens
plus the current token in ONE cached forward of width spec_k+1, accepting the
longest prefix that matches the model's own greedy predictions — with greedy
acceptance the emitted stream is IDENTICAL token-for-token to plain greedy
decoding no matter what the draft source proposes (an accepted draft token
*equals* the argmax the plain loop would have produced), so any acceptance
rate > 0 is pure step-count profit and a wrong draft costs nothing but the
verify width.

Drafts come from prompt-lookup (PLD): the last bigram of the accepted stream
is matched against a per-slot device-resident token history (prompt tokens +
accepted output), and the spec_k tokens following the most recent earlier
match are proposed. Radiology traffic is unusually PLD-friendly — grounding
answers quote the prompt phrase, and reports repeat house templates ("There is
no ...") — and PLD needs no second model, no extra HBM beyond an int32
[slots, max_len] history (~0.8 MB), and no host round-trip (the whole
propose/verify/accept loop stays inside the engine's chunked lax.scan, so the
pipelined no-readback dispatch scheme is preserved).

The reference has no speculative path at all — its serving loop is HF
`generate`, one token per step (`finetuning/llava/serve/model_worker.py`).

TPU notes: everything is fixed-shape (draft width spec_k, window spec_k+1,
emit [B, spec_k+1] + counts [B]); the per-row windowed cache write is
`models/qwen2._block_cached` (s > 1 branch) and window attention rides the
XLA path with a per-row causal q_offset mask (`ops/attention.make_attention_mask`).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def write_history(
    hist: jnp.ndarray, widx: jnp.ndarray, window: jnp.ndarray
) -> jnp.ndarray:
    """Scatter a per-row token window into the history at [widx, widx+s).

    hist: [B, S] int32; widx: [B] int32; window: [B, s] int32. Positions past
    the accepted prefix hold stale tokens until the next window overwrites
    them — stale entries are at indices >= the next step's widx, and a stale
    draft that happens to equal the model's argmax is by definition correct,
    so staleness never corrupts output (same invariant as the KV cache).
    """
    b, s = window.shape
    rows = jnp.arange(b)[:, None]
    idxw = widx[:, None] + jnp.arange(s)[None]
    return hist.at[rows, idxw].set(window)


def propose_ngram(
    hist: jnp.ndarray, widx: jnp.ndarray, spec_k: int
) -> jnp.ndarray:
    """Draft spec_k tokens per row by matching the stream's last bigram.

    hist: [B, S] int32 token history by CACHE position — prompt ids where the
    prompt's segment mask is 1, -1 at left-pad/image positions (never matches
    generated ids, which are >= 0), accepted tokens appended during decode.
    widx: [B] position of the CURRENT token (already written to hist).

    Returns [B, spec_k] drafts: the tokens following the most recent earlier
    occurrence of (hist[widx-1], hist[widx]); zeros when no match (greedy
    acceptance then stops wherever the model disagrees — still sound).
    """
    b, smax = hist.shape
    p0 = jnp.take_along_axis(
        hist, jnp.maximum(widx - 1, 0)[:, None], axis=1
    )[:, 0]
    p1 = jnp.take_along_axis(hist, widx[:, None], axis=1)[:, 0]
    pos = jnp.arange(smax - 1)
    m = (hist[:, :-1] == p0[:, None]) & (hist[:, 1:] == p1[:, None])
    # Strictly before the query bigram itself.
    m = m & (pos[None] < (widx - 1)[:, None])
    score = jnp.where(m, pos[None] + 1, 0)  # last match wins
    j = jnp.argmax(score, axis=1)  # [B] match start (valid iff found)
    found = jnp.max(score, axis=1) > 0
    gather = jnp.clip(
        j[:, None] + 2 + jnp.arange(spec_k)[None], 0, smax - 1
    )
    draft = jnp.take_along_axis(hist, gather, axis=1)
    return jnp.where(found[:, None], draft, 0).astype(jnp.int32)


def greedy_accept(
    logits: jnp.ndarray, draft: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Longest-prefix greedy acceptance over a verify window.

    logits: [B, k+1, V] — position j predicts the token AFTER window token j
    (window = [current, draft[0], ..., draft[k-1]]).
    draft: [B, k] proposed tokens.

    Returns (pred [B, k+1] int32 greedy predictions — the emission stream is
    pred[:, :n_emit]; n_emit [B] = accepted+1 tokens to emit this step;
    next_tok [B] = pred[acc], the new current token).
    """
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, k+1]
    match = pred[:, :-1] == draft  # [B, k]
    acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # [B]
    n_emit = acc + 1
    next_tok = jnp.take_along_axis(pred, acc[:, None], axis=1)[:, 0]
    return pred, n_emit, next_tok


def history_from_prompt(
    tokens: jnp.ndarray,
    segment_ids: jnp.ndarray,
    img_src: jnp.ndarray,
    max_len: int,
) -> jnp.ndarray:
    """Collated prompt ids [B, L] -> [B, max_len] history rows.

    Left-pad positions (segment id 0, token id 0 — a REAL vocab id) and image
    positions (img_src >= 0) become -1 so the bigram matcher can never anchor
    on them; generated ids are >= 0."""
    b, l = tokens.shape
    text = (segment_ids != 0) & (img_src < 0)
    row = jnp.where(text, tokens, -1).astype(jnp.int32)
    return jnp.concatenate(
        [row, jnp.full((b, max_len - l), -1, jnp.int32)], axis=1
    )
