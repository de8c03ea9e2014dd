"""Batched, fully-jitted joint CTC/attention beam search with LM shallow fusion.

TPU-native re-design of espnet's ``BeamSearch``/``BatchBeamSearch`` as driven
by the reference (/root/reference/src/inference/avsr_inference.py:249-311:
scorers {decoder: 1-w, ctc: w, lm: lm_w, length_bonus: penalty}). The
object-oriented, dynamically-shaped hypothesis sets become fixed-shape
tensorized beams (SURVEY.md §7 "hard parts"):

- hypotheses live in a static (B, K, L+1) token buffer; per-step scoring is a
  full-prefix recompute through the decoder (traced once, static shapes);
- the CTC prefix scorer is the scanned DP in ``ctc_prefix.py``, evaluated only
  for the top ``pre_beam`` candidates (espnet's partial-scorer pruning);
- finished hypotheses (eos emitted) migrate to a separate finished buffer via
  a top-k merge each step; at each utterance's maxlen the search is forced to
  emit eos (espnet appends eos at maxlen);
- the whole search is one ``lax.while_loop`` — jittable, batched over B
  utterances (the reference decodes batch_size=1 only; pod-batched decoding is
  the main RTF headroom identified in SURVEY.md §7.9) — with EXACT early
  termination: the loop stops as soon as no alive hypothesis' score upper
  bound (alive + remaining_steps * max(0, penalty); all other per-step deltas
  are log-probs <= 0) can displace the nbest-th finished score of any
  utterance, which provably leaves the returned n-best unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

# shard_map wrapper for the Pallas cache kernels under pod-batched decode
# (one source of truth, shared with ops.attention.attend_kv_anc)
from tailored_avsr_tpu.ops.backend import is_tpu_backend
from tailored_avsr_tpu.parallel.mesh import shard_pallas_over_data

from tailored_avsr_tpu.decode.ctc_prefix import (
    CTCPrefixState,
    ctc_prefix_init_state,
    ctc_prefix_score_step,
    ctc_prefix_select,
    neutralize_padding,
    to_time_minor,
)

NEG_INF = -1.0e10

def reorder_beam_rows(x: jnp.ndarray, src_bk: jnp.ndarray) -> jnp.ndarray:
    """Permute beam rows of a KV cache: ``out[b, i] = x[b*K + src_bk[b, i]]``.

    Formulation chosen by measurement (scripts/bench_reorder.py, v5e-1,
    32-leaf LM-cache pytree, N=320, 33 MB leaves, inside a fori_loop):
    flat ``x[g_src]`` per leaf 8.2 ms/step; take_along_axis with an explicit
    batch dim 34.7 ms; per-utterance one-hot matmul 17.5 ms (the MXU pads
    K=M=beam up to its 128 tile, amplifying traffic); masked VPU sum 146 ms.
    The flat gather is only pathological when the leaf is one huge stacked
    buffer (multi-GB rows serialize into a per-index dynamic-slice loop —
    scripts/profile_beam.py); keep caches as per-layer tensors and gather.
    """
    b, k = src_bk.shape
    g_src = (jnp.arange(b)[:, None] * k + src_bk).reshape(b * k)
    return x[g_src]


def insert_permute_rows(
    x: jnp.ndarray,  # (N, H, Lc, dk) cache leaf
    new_col: jnp.ndarray,  # (N, H, 1, dk) this step's K or V column
    src_bk: jnp.ndarray,  # (B, K) beam-source indices
    pos: jnp.ndarray,  # scalar: column pos-1 receives the new column
) -> jnp.ndarray:
    """Beam-reorder a KV-cache leaf AND insert the step's new column in one
    fused pass: ``out[b*K+i] = x[b*K+src[b,i]]`` with column ``pos-1``
    replaced by ``new_col[b*K+src[b,i]]``.

    This replaces dynamic-update-slice-then-gather: a DUS inside the scorer
    forces XLA to materialize a full cache copy per leaf per step in the beam
    while-loop (the gather downstream prevents the in-place update), measured
    at ~0.5 ms per 33 MB leaf vs ~0.08 ms for this single gather+select pass
    (scripts/bench_lm_step.py, v5e-1). The select is elementwise, so XLA
    fuses it into the gather's output loop — one read, one write, at HBM
    bandwidth when the surrounding loop lets the output land in a fresh
    buffer (see the unrolled beam loop in ``beam_search``).
    """
    b, k = src_bk.shape
    g_src = (jnp.arange(b)[:, None] * k + src_bk).reshape(b * k)
    colmask = (jnp.arange(x.shape[2]) == pos - 1)[None, None, :, None]
    return jnp.where(colmask, new_col[g_src].astype(x.dtype), x[g_src])


def write_beam_column(
    x: jnp.ndarray, new_col: jnp.ndarray, pos: jnp.ndarray, mesh=None
) -> jnp.ndarray:
    """Write this step's K/V columns into a group-major (B, H, K, Lc, dk)
    ancestry cache at column ``pos-1`` — no reorder.

    The ancestry-cache protocol's only per-step cache write: every slot
    writes the column it computed, and the ancestry table
    (``update_ancestry``) records which slot each hypothesis' history column
    lives in. ``new_col`` is the scorer's (N, H, 1, dk) per-row column.

    On TPU the write is a Pallas DMA into the aliased cache buffer
    (ops/cache_update.py): XLA's dynamic-update-slice lowers this
    column write to a scalarized strided scatter measured at ~709 us per
    32 MB leaf — slower than copying the whole buffer — and with ~44 cache
    leaves per flagship decode step that scatter dominated the entire beam
    loop (scripts/bench_cache_write.py). On CPU (tests) the DUS is fine.
    """
    b, h, km, lc, dk = x.shape
    upd = new_col[:, :, 0].reshape(b, km, h, dk).transpose(0, 2, 1, 3)
    on_tpu = is_tpu_backend()
    # TAVSR_FORCE_PALLAS_WRITES=1: run the Pallas RMW kernel in interpret
    # mode on CPU so CI exercises it inside the full beam graph
    if on_tpu or os.environ.get("TAVSR_FORCE_PALLAS_WRITES", "0") == "1":
        from tailored_avsr_tpu.ops.cache_update import write_cache_column

        call = functools.partial(write_cache_column, interpret=not on_tpu)
        call = shard_pallas_over_data(call, mesh, b, n_arrays=2, n_outs=1)
        return call(x, upd, pos - 1)
    return jax.lax.dynamic_update_slice(
        x, upd[:, :, :, None, :].astype(x.dtype), (0, 0, 0, pos - 1, 0)
    )


def write_beam_columns_kv(
    ck: jnp.ndarray,  # (B, H, K, Lc, dk) key cache
    cv: jnp.ndarray,  # (B, H, K, Lc, dk) value cache
    k_new: jnp.ndarray,  # (N, H, 1, dk) this step's key column
    v_new: jnp.ndarray,  # (N, H, 1, dk) this step's value column
    pos: jnp.ndarray,
    mesh=None,
):
    """One layer's K and V column writes fused into a single kernel call.

    The per-leaf ``write_beam_column`` kernel is grid-step-overhead bound
    (~31 us/leaf vs <1 us of 8-column DMA), and the flagship decode step has
    44 leaves; pairing k/v and gridding several batch rows per step
    (ops/cache_update.py write_cache_columns_kv) cuts that overhead ~8x.
    """
    if isinstance(ck, tuple):
        # int8 cache side (payload, per-column scale): quantize this step's
        # bf16 columns (ops/kv_quant.py), write the payload through the same
        # paired column kernel, and update the tiny scale planes in place
        from tailored_avsr_tpu.ops.kv_quant import quantize_kv_column

        (ck_p, ck_s), (cv_p, cv_s) = ck, cv
        kq, ks = quantize_kv_column(k_new)  # (N,H,1,dk) int8, (N,H,1)
        vq, vs = quantize_kv_column(v_new)
        kp, vp = write_beam_columns_kv(ck_p, cv_p, kq, vq, pos, mesh=mesh)
        b, h, km, lc = ck_s.shape
        ksu = ks[:, :, 0].reshape(b, km, h).transpose(0, 2, 1)  # (B,H,K)
        vsu = vs[:, :, 0].reshape(b, km, h).transpose(0, 2, 1)
        ck_s = jax.lax.dynamic_update_slice(
            ck_s, ksu[..., None].astype(ck_s.dtype), (0, 0, 0, pos - 1)
        )
        cv_s = jax.lax.dynamic_update_slice(
            cv_s, vsu[..., None].astype(cv_s.dtype), (0, 0, 0, pos - 1)
        )
        return (kp, ck_s), (vp, cv_s)
    b, h, km, lc, dk = ck.shape
    ku = k_new[:, :, 0].reshape(b, km, h, dk).transpose(0, 2, 1, 3)
    vu = v_new[:, :, 0].reshape(b, km, h, dk).transpose(0, 2, 1, 3)
    on_tpu = is_tpu_backend()
    if on_tpu or os.environ.get("TAVSR_FORCE_PALLAS_WRITES", "0") == "1":
        from tailored_avsr_tpu.ops.cache_update import write_cache_columns_kv

        call = functools.partial(write_cache_columns_kv, interpret=not on_tpu)
        call = shard_pallas_over_data(call, mesh, b, n_arrays=4, n_outs=2)
        return call(ck, cv, ku, vu, pos - 1)
    return (
        jax.lax.dynamic_update_slice(
            ck, ku[:, :, :, None, :].astype(ck.dtype), (0, 0, 0, pos - 1, 0)
        ),
        jax.lax.dynamic_update_slice(
            cv, vu[:, :, :, None, :].astype(cv.dtype), (0, 0, 0, pos - 1, 0)
        ),
    )


def update_ancestry(
    anc: jnp.ndarray,  # (N, Lc) int32
    g_src: jnp.ndarray,  # (N,) global beam-source rows
    src_bk: jnp.ndarray,  # (B, K) within-group beam-source indices
    pos: jnp.ndarray,  # scalar: column pos-1 was just written
) -> jnp.ndarray:
    """Thread the ancestry table through a beam reorder.

    New slot i of group b continues the hypothesis that occupied slot
    ``src_bk[b, i]``; it inherits that slot's ancestry for columns < pos-1,
    and its column pos-1 (written this step by the source slot itself) lives
    at ``src_bk[b, i]``.
    """
    n = anc.shape[0]
    anc = anc[g_src]
    return jax.lax.dynamic_update_slice(
        anc, src_bk.reshape(n, 1).astype(anc.dtype), (0, pos - 1)
    )


@dataclasses.dataclass(frozen=True)
class BeamSearchConfig:
    beam_size: int = 30
    ctc_weight: float = 0.1
    lm_weight: float = 0.0
    penalty: float = 0.0
    maxlenratio: float = 0.0
    minlenratio: float = 0.0
    pre_beam_ratio: float = 1.5
    nbest: int = 1
    early_exit: bool = True  # exact upper-bound loop termination (see below)
    # beam steps per while-loop iteration (1 or 2). An XLA while-state leaf is
    # a FIXED buffer and a gather cannot write into its own input buffer, so a
    # 1-step body ends every iteration with a full copy-back of each KV-cache
    # leaf; with 2 steps per body the second reorder's input is already a
    # temporary and its output lands in the state buffer directly — measured
    # 8.2 -> 2.5 ms/step on the 1.07 GB LM cache (scripts/bench_lm_step.py).
    # Result-exact: the at-most-one extra step past the stop condition cannot
    # change the returned n-best (see the note above ``cond`` in beam_search).
    unroll: int = 2
    # weight for the n-gram part scorer (``ngram_part_fn`` in beam_search):
    # applied to the pre-beam candidates only, espnet NgramPartScorer
    # semantics (the full n-gram scorer instead rides lm_score_fn)
    ngram_weight: float = 0.0
    # Phased attend widths (ancestry protocol): run the loop as consecutive
    # while_loops where steps i < w attend only cache columns [0, w) — the
    # fused group-attend kernel's BlockSpec narrows, so early steps read only
    # the live prefix of the cache instead of all Lc columns (~2x less attend
    # traffic on average). Entries <= 1 are fractions of the max decode
    # length, > 1 absolute column counts; each is rounded up to a multiple of
    # 8 (kernel tile). Exact search: columns >= pos-1 are masked dead in
    # every formulation and a phase only covers steps whose live prefix fits
    # its width, so only f32 reduction-order noise differs
    # (tests/test_kv_cache.py asserts identical n-best hypotheses).
    phase_widths: tuple = ()
    # sublane tile the phased widths must round to: 8 for f32/bf16 caches,
    # 32 for the int8 payload tiling (set by the engine from cache_dtype)
    width_tile: int = 8


class BeamSearchResult(NamedTuple):
    tokens: jnp.ndarray  # (B, nbest, L+2) includes sos ... eos, padded with eos
    scores: jnp.ndarray  # (B, nbest)
    lengths: jnp.ndarray  # (B, nbest) token count excluding sos/eos


def beam_search(
    att_score_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    ctc_logp: jnp.ndarray,  # (B, T, V) CTC log-probs from the encoder
    enc_lens: jnp.ndarray,  # (B,)
    sos: int,
    eos: int,
    config: BeamSearchConfig,
    lm_score_fn: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None,
    blank_id: int = 0,
    att_state: Optional[object] = None,
    att_gather_fn: Optional[Callable] = None,
    att_fn_for_width: Optional[Callable] = None,
    ngram_part_fn: Optional[Callable] = None,
) -> BeamSearchResult:
    """att_score_fn(ys (N, L+2), pos scalar) -> (N, V) step log-probs.

    N = B * beam_size; ys rows are sos-prefixed fixed-size buffers.

    KV-cache fast path: pass ``att_state`` (a pytree with leading dim N on
    every leaf, e.g. a decoder KV cache) and make att_score_fn a stateful
    ``(ys, pos, state) -> (logp, new_state)``; the search threads the state
    through the loop and gathers its rows on every beam reorder.
    ``att_gather_fn(state, g_src (N,), pos scalar) -> state`` overrides that
    gather (e.g. the length-segmented cache skips dead segments); default is
    a plain ``x[g_src]`` over every leaf.
    """
    b, t, v = ctc_logp.shape
    k = config.beam_size
    p = min(v, max(1, int(config.pre_beam_ratio * k)))
    # decode at most one token per encoder frame; a positive maxlenratio also
    # caps the COMPILED loop length (smaller token buffer, shorter worst
    # case); a NEGATIVE maxlenratio is espnet's constant max output length
    # (|maxlenratio| tokens regardless of input length — ref
    # avsr_inference.py:871-872), still capped at one token per frame here
    # (KV caches are sized from t; joint CTC scores longer outputs -inf)
    if config.maxlenratio == 0.0:
        lmax = t
    elif config.maxlenratio < 0.0:
        lmax = max(1, min(t, int(-config.maxlenratio)))
    else:
        lmax = max(1, min(t, int(config.maxlenratio * t)))
    n = b * k

    use_ctc = config.ctc_weight > 0.0
    att_w = 1.0 - config.ctc_weight
    if config.maxlenratio == 0.0:
        maxlen = enc_lens
    elif config.maxlenratio < 0.0:
        maxlen = jnp.full_like(enc_lens, lmax)
    else:
        maxlen = jnp.floor(config.maxlenratio * enc_lens).astype(jnp.int32)
    maxlen = jnp.maximum(1, maxlen)  # (B,)
    # the loop runs lmax steps; an unclamped maxlen (maxlenratio > 1) would
    # never hit the force-eos gate and silently drop unfinished hypotheses
    maxlen = jnp.minimum(maxlen, lmax)
    minlen = jnp.floor(config.minlenratio * enc_lens).astype(jnp.int32)

    # hypothesis i of utterance b lives at row b*k+i forever; time-minor
    # (N, V, T) layout keeps the prefix DP's vector lanes full (ctc_prefix.py)
    if use_ctc:
        logp_vt = to_time_minor(
            jnp.repeat(
                neutralize_padding(ctc_logp, enc_lens, blank_id), k, axis=0
            )
        )
        ctc_state = ctc_prefix_init_state(logp_vt, blank_id)
    else:
        # attention-only decoding: do not allocate or carry the (N, V, T)
        # prefix-DP state (it would be loop-carried and un-DCE-able)
        logp_vt, ctc_state = None, None

    ys = jnp.full((b, k, lmax + 2), eos, jnp.int32).at[:, :, 0].set(sos)
    scores = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)
    fin_tokens = jnp.full((b, k, lmax + 2), eos, jnp.int32)
    fin_scores = jnp.full((b, k), NEG_INF)
    fin_lengths = jnp.zeros((b, k), jnp.int32)

    stateful = att_state is not None

    def step(carry, score_fn=att_score_fn):
        i, ys, scores, ctc_state, att_st, fin_tokens, fin_scores, fin_lengths = carry
        pos = i + 1  # position being generated
        ys_flat = ys.reshape(n, lmax + 2)
        if stateful:
            att_logp, att_st = score_fn(ys_flat, jnp.asarray(pos), att_st)
        else:
            att_logp = score_fn(ys_flat, jnp.asarray(pos))  # (N, V)
        # with att_w == 0 (pure-CTC decoding) the weighted scores would be
        # constant and top_k would pick tokens 0..P-1 by tie-break; use the
        # unweighted decoder posterior for candidate SELECTION only (the
        # accumulated totals still use att_w * att_logp, i.e. zero)
        sel_w = att_w if att_w > 0.0 else 1.0
        step_logp = sel_w * att_logp
        if lm_score_fn is not None and config.lm_weight > 0.0:
            step_logp = step_logp + config.lm_weight * lm_score_fn(
                ys_flat, jnp.asarray(pos)
            )
        step_logp = step_logp + config.penalty  # LengthBonus: +1 per token

        # eos gating: block eos before minlen, force eos at maxlen
        pos_b = jnp.full((b,), i, jnp.int32)
        block_eos = (pos_b < minlen)[:, None, None]  # (B,1,1)
        force_eos = (pos_b >= maxlen - 1)[:, None, None]
        is_eos = (jnp.arange(v) == eos)[None, None, :]
        gate = jnp.zeros((b, 1, v))
        gate = jnp.where(block_eos & is_eos, NEG_INF, gate)
        gate = jnp.where(force_eos & ~is_eos, NEG_INF, gate)
        step_logp = step_logp + gate.repeat(k, axis=1).reshape(n, v)
        # blank is never a decoder output
        step_logp = step_logp.at[:, blank_id].add(NEG_INF)

        # pre-beam candidate selection on the full (decoder+lm) scores
        pre_scores, cand_ids = jax.lax.top_k(step_logp, p)  # (N, P)
        if att_w == 0.0:
            # selection used the unweighted posterior; the kept score is 0*att
            pre_scores = (
                pre_scores
                - jnp.take_along_axis(att_logp, cand_ids, axis=1)
            )
        if use_ctc:
            psi, r_new = ctc_prefix_score_step(
                logp_vt, ctc_state, cand_ids, eos, blank_id
            )
            ctc_delta = psi - ctc_state.score[:, None]
            cand_scores = pre_scores + config.ctc_weight * ctc_delta
        else:
            psi = r_new = None
            cand_scores = pre_scores
        # n-gram part scorer: like CTC, scores only the pre-beam candidates
        # (espnet PartialScorerInterface — selection above ran without it)
        if ngram_part_fn is not None and config.ngram_weight > 0.0:
            cand_scores = cand_scores + config.ngram_weight * ngram_part_fn(
                ys_flat, jnp.asarray(pos), cand_ids
            )
        total = scores.reshape(n, 1) + cand_scores  # (N, P)
        total = jnp.maximum(total, NEG_INF)

        # ----- split candidates into finished (eos) and alive (non-eos) -----
        cand_tok = cand_ids.reshape(b, k * p)
        cand_total = total.reshape(b, k * p)
        eos_cand = cand_tok == eos

        # merge newly finished into the finished buffer (top-k of 2k*p... keep k)
        fin_cand_scores = jnp.where(eos_cand, cand_total, NEG_INF)  # (B, K*P)
        merged_scores = jnp.concatenate([fin_scores, fin_cand_scores], axis=1)
        top_fin, top_fin_idx = jax.lax.top_k(merged_scores, k)  # (B, K)
        from_old = top_fin_idx < k
        new_src = jnp.clip(top_fin_idx - k, 0, k * p - 1) // p  # source hyp in beam
        # finished token buffer: old rows keep theirs; new rows = ys[src] + eos at pos
        batch_idx = jnp.arange(b)[:, None]
        new_fin_tokens = ys[batch_idx, new_src]  # (B, K, L+2)
        new_fin_tokens = new_fin_tokens.at[:, :, pos].set(eos)
        old_rows = jnp.clip(top_fin_idx, 0, k - 1)
        fin_tokens = jnp.where(
            from_old[..., None],
            fin_tokens[batch_idx, old_rows],
            new_fin_tokens,
        )
        fin_lengths = jnp.where(
            from_old, fin_lengths[batch_idx, old_rows], jnp.full_like(new_src, i)
        )
        fin_scores = top_fin

        # alive: top-k non-eos candidates
        alive_scores_all = jnp.where(eos_cand, NEG_INF, cand_total)
        top_alive, top_alive_idx = jax.lax.top_k(alive_scores_all, k)  # (B, K)
        src_hyp = top_alive_idx // p  # (B, K) source row in beam
        sel_cand = top_alive_idx % p
        new_ys = ys[batch_idx, src_hyp]
        new_tok = cand_tok[batch_idx, top_alive_idx]
        new_ys = new_ys.at[:, :, pos].set(new_tok)

        g_src = (jnp.arange(b)[:, None] * k + src_hyp).reshape(n)
        if use_ctc:
            ctc_state = ctc_prefix_select(
                ctc_state, psi, r_new, cand_ids, g_src, sel_cand.reshape(n)
            )
        if stateful:
            if att_gather_fn is not None:
                att_st = att_gather_fn(att_st, g_src, jnp.asarray(pos))
            else:
                att_st = jax.tree_util.tree_map(
                    lambda x: reorder_beam_rows(x, src_hyp), att_st
                )
        return (i + 1, new_ys, top_alive, ctc_state, att_st, fin_tokens,
                fin_scores, fin_lengths)

    nbest = min(config.nbest, k)

    # EXACT early termination: every per-step score delta is a log-prob
    # (<= 0) plus the length penalty, so an alive hypothesis can gain at
    # most max(0, penalty) per remaining step. Once even the best alive
    # hypothesis' upper bound cannot displace the nbest-th finished score
    # for ANY utterance, running further steps cannot change the result.
    #
    # With unroll=2 the body may run ONE step past the point where cond
    # turns false; that step is result-inert in both stopping cases:
    # - past lmax: every utterance's force-eos gate fired by maxlen-1, so
    #   each utterance already holds K genuinely-finished hypotheses with
    #   ordinary-magnitude scores, while post-force alive scores are
    #   clamped to exactly NEG_INF — any further candidate scores at most
    #   NEG_INF + penalty and cannot displace the K real entries;
    # - early-exit: the upper-bound argument above covers one more step
    #   (candidates score <= bound <= nbest-th finished), and exact ties
    #   keep the OLD entry (finished buffer comes first in the top-k
    #   merge, lax.top_k prefers the lower index).
    # With phased widths the same cond runs per phase with hi = the phase
    # boundary instead of lmax.
    def make_cond(hi):
        def cond(carry):
            i, _, scores, _, _, _, fin_scores, _ = carry
            if not config.early_exit:
                return i < hi
            pen = max(config.penalty, 0.0)
            steps_left = jnp.maximum(maxlen - i, 0).astype(scores.dtype)  # (B,)
            bound = jnp.max(scores, axis=1) + steps_left * pen  # (B,)
            thresh = fin_scores[:, nbest - 1]  # nbest-th best finished so far
            return (i < hi) & ~jnp.all(bound <= thresh)
        return cond

    carry = (jnp.asarray(0, jnp.int32), ys, scores, ctc_state, att_state,
             fin_tokens, fin_scores, fin_lengths)
    unroll = max(1, min(int(config.unroll), 2))  # >2 would overrun ys (L+2)

    def make_body(score_fn):
        def body(carry):
            for _ in range(unroll):
                carry = step(carry, score_fn)
            return carry
        return body

    # Phased attend widths: steps i in [0, w) only ever have a live cache
    # prefix of w-1 columns (pos-1 <= i+1 <= w even with the unroll-2
    # overshoot), so attending columns [0, w) is exact. Each phase is its own
    # while_loop over the SAME carry; the early-exit condition composes, so a
    # search finished in phase 1 no-ops through the rest.
    phases = []
    if config.phase_widths and stateful and att_fn_for_width is not None:
        prev = 0
        for w in config.phase_widths:
            w = int(w * lmax) if 0 < w <= 1 else int(w)
            w = -(-w // config.width_tile) * config.width_tile  # kernel tile
            if prev < w < lmax:
                phases.append(w)
                prev = w
    for w in phases:
        carry = jax.lax.while_loop(
            make_cond(w), make_body(att_fn_for_width(w)), carry
        )
    carry = jax.lax.while_loop(make_cond(lmax), make_body(att_score_fn), carry)
    _, _, _, _, _, fin_tokens, fin_scores, fin_lengths = carry
    best_scores, best_idx = jax.lax.top_k(fin_scores, nbest)
    batch_idx = jnp.arange(b)[:, None]
    return BeamSearchResult(
        tokens=fin_tokens[batch_idx, best_idx],
        scores=best_scores,
        lengths=fin_lengths[batch_idx, best_idx],
    )
