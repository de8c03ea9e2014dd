"""Self-attention variants: absolute MHA, Transformer-XL relative-position MHA
(with learned u/v biases), and Fastformer additive attention.

Capability parity with espnet's ``MultiHeadedAttention`` /
``RelPositionMultiHeadedAttention`` / ``FastSelfAttention`` as selected by the
reference encoders (/root/reference/src/encoder/branchformer/encoder.py:222-259,
src/encoder/audiovisual/tailored/encoder.py:119-153).

TPU-first notes:
- heads and head-dim stay packed as one (B, H, T, Dk) tensor so the two matmuls
  per attention land on the MXU as large batched GEMMs.
- the rel-shift is the pad+reshape trick (pure data movement, fused by XLA) —
  no gather.
- softmax accumulates in float32 regardless of input dtype (bf16-safe).
- a fused Pallas flash-attention path for long sequences lives in
  ``ops/flash_attention.py`` and is used by the encoders when enabled.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.ops.backend import is_tpu_backend
from tailored_avsr_tpu.ops.masking import MASK_MIN

# ancestry-beam group attend: fused Pallas kernel on TPU (see attend_kv_anc).
# Env opt-out (TAVSR_FUSED_GROUP_ATTEND=0) exists for A/B benchmarking only;
# callers select per call via attend_kv_anc's ``fused`` argument (None = this
# default). No mutable module state: one engine's choice never leaks into
# another's graph.
_FUSED_GROUP_ATTEND = os.environ.get("TAVSR_FUSED_GROUP_ATTEND", "1") != "0"


def _masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Softmax over the last axis with masking.

    scores: (B, H, Tq, Tk); mask: (B, Tk) key-side or (B, Tq, Tk) pairwise,
    True=valid, or None. Fully-masked rows produce zeros (matches espnet's
    masked_fill-after-softmax).
    """
    scores = scores.astype(jnp.float32)
    if mask is not None:
        m = mask[:, None, None, :] if mask.ndim == 2 else mask[:, None, :, :]
        scores = jnp.where(m, scores, MASK_MIN)
        attn = nn.softmax(scores, axis=-1)
        attn = jnp.where(m, attn, 0.0)
    else:
        attn = nn.softmax(scores, axis=-1)
    return attn


class MultiHeadedAttention(nn.Module):
    """Standard scaled dot-product multi-head attention.

    Setup-style so decoders can reuse the projections and attention scores
    (the Sim-T decoder shares one MHA across self/cross/"post" sub-blocks and
    re-applies layer-1 scores to fresh values —
    /root/reference/src/decoder/sim_t/transformer/decoder_layer.py:81-189).
    ``mask`` may be (B, Tk) key-side or (B, Tq, Tk) pairwise (causal decoding).
    """

    num_heads: int
    dropout_rate: float = 0.0
    model_dim: Optional[int] = None  # required for attend/apply_scores methods

    def setup(self):
        if self.model_dim is not None:
            assert self.model_dim % self.num_heads == 0
            d = self.model_dim
            self.linear_q = nn.Dense(d, name="linear_q")
            self.linear_k = nn.Dense(d, name="linear_k")
            self.linear_v = nn.Dense(d, name="linear_v")
            self.linear_out = nn.Dense(d, name="linear_out")
        self.dropout = nn.Dropout(self.dropout_rate)

    def _heads(self, y: jnp.ndarray) -> jnp.ndarray:
        h = self.num_heads
        dk = y.shape[-1] // h
        return y.reshape(y.shape[:-1] + (h, dk)).transpose(0, 2, 1, 3)

    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        out, attn = self.attend(query, key, value, mask, deterministic=deterministic)
        return (out, attn) if return_attn else out

    def attend(self, query, key, value, mask=None, *, deterministic: bool = True):
        d = query.shape[-1]
        if self.model_dim is None:
            raise ValueError("MultiHeadedAttention requires model_dim")
        dk = d // self.num_heads
        q = self._heads(self.linear_q(query))
        k = self._heads(self.linear_k(key))
        v = self._heads(self.linear_v(value))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(dk, jnp.float32))
        attn = _masked_softmax(scores, mask).astype(v.dtype)
        attn_d = self.dropout(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn_d, v)
        out = out.transpose(0, 2, 1, 3).reshape(query.shape[:-1] + (d,))
        return self.linear_out(out), attn

    def project_kv(self, x: jnp.ndarray):
        """(B, T, D) -> heads-form key/value (B, H, T, dk) for KV caching."""
        return self._heads(self.linear_k(x)), self._heads(self.linear_v(x))

    def attend_kv(
        self,
        query: jnp.ndarray,  # (B, 1, D) single-step query input
        k: jnp.ndarray,  # (B, H, T, dk) cached keys
        v: jnp.ndarray,  # (B, H, T, dk) cached values
        mask: Optional[jnp.ndarray] = None,  # (B, T) key validity
    ) -> jnp.ndarray:
        """Single-query attention over cached K/V (decode fast path)."""
        d = query.shape[-1]
        dk = d // self.num_heads
        q = self._heads(self.linear_q(query))  # (B, H, 1, dk)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(dk, jnp.float32)
        )
        attn = _masked_softmax(scores, mask).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(query.shape[0], 1, d)
        return self.linear_out(out)

    def project_qkv(self, x: jnp.ndarray):
        """Single fused (D -> 3D) projection: heads-form (q, k, v).

        The decode beam loop is kernel-dispatch-bound at beam dims (~0.1 ms
        per fusion on v5e vs ~0.02 ms of actual weight traffic), so the three
        separate q/k/v matmuls are folded into one; the weight concatenation
        is loop-invariant and hoisted out of the decode while-loop by XLA.
        Same reductions per output element as linear_q/k/v.
        """
        pq, pk, pv = (
            m.variables["params"]
            for m in (self.linear_q, self.linear_k, self.linear_v)
        )
        w = jnp.concatenate([pq["kernel"], pk["kernel"], pv["kernel"]], axis=1)
        b = jnp.concatenate([pq["bias"], pk["bias"], pv["bias"]])
        y = x @ w + b
        q, k, v = jnp.split(y, 3, axis=-1)
        return self._heads(q), self._heads(k), self._heads(v)

    def attend_kv_append(
        self,
        query: jnp.ndarray,  # (B, 1, D) single-step query input
        k: jnp.ndarray,  # (B, H, T, dk) cached keys (current step NOT written)
        v: jnp.ndarray,  # (B, H, T, dk) cached values
        k_new: jnp.ndarray,  # (B, H, 1, dk) this step's key column
        v_new: jnp.ndarray,  # (B, H, 1, dk) this step's value column
        mask: Optional[jnp.ndarray] = None,  # (B, T) cache-column validity
        q_heads: Optional[jnp.ndarray] = None,  # precomputed (B, H, 1, dk)
    ) -> jnp.ndarray:
        """Single-query attention over cached K/V plus one logically-appended
        column. The decode beam loop uses this so the cache is never written
        inside the scorer: per step the cache is READ once here, and the new
        column is folded into the beam-reorder gather afterwards
        (``decode.beam_search.insert_permute_rows``) — one fused write pass.
        Writing the column first (dynamic-update-slice) costs a full extra
        cache materialization per layer per step inside the while loop, the
        dominant term of the profiled beam decode (scripts/bench_lm_step.py).
        """
        d = query.shape[-1]
        dk = d // self.num_heads
        q = (
            q_heads
            if q_heads is not None
            else self._heads(self.linear_q(query))
        )  # (B, H, 1, dk)
        scale = 1.0 / jnp.sqrt(jnp.asarray(dk, jnp.float32))
        s_cache = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale  # (B, H, 1, T)
        s_new = jnp.einsum("bhqd,bhkd->bhqk", q, k_new) * scale  # (B, H, 1, 1)
        scores = jnp.concatenate([s_cache, s_new], axis=-1)
        if mask is not None:
            mask = jnp.concatenate(
                [mask, jnp.ones((mask.shape[0], 1), mask.dtype)], axis=-1
            )
        attn = _masked_softmax(scores, mask).astype(v.dtype)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", attn[..., :-1], v
        ) + attn[..., -1:] * v_new
        out = out.transpose(0, 2, 1, 3).reshape(query.shape[0], 1, d)
        return self.linear_out(out)

    def attend_kv_anc(
        self,
        k: jnp.ndarray,  # (B, H, beam, Lc, dk) group-major cached keys
        v: jnp.ndarray,  # (B, H, beam, Lc, dk) group-major cached values
        k_new: jnp.ndarray,  # (N, H, 1, dk) this step's key column (self)
        v_new: jnp.ndarray,  # (N, H, 1, dk) this step's value column
        anc: jnp.ndarray,  # (N, >=Lc) int32 ancestry: column t of row n's
        #                    history lives in cache slot anc[n, t] of its group
        pos: jnp.ndarray,  # scalar: cache columns < pos-1 are live
        beam: int,
        q_heads: jnp.ndarray,  # precomputed (N, H, 1, dk) query heads
        width: int | None = None,  # static: attend only columns [0, width)
        fused: bool | None = None,  # None = fused kernel on TPU (env-gated);
        #   True forces the Pallas path (interpret mode off-TPU — CI coverage);
        #   False forces the XLA formulation (A/B benchmarking)
        mesh=None,  # jax.sharding.Mesh: shard_map the fused kernel over its
        #   'data' axis so pod-batched decode keeps the Pallas path per-shard
        #   (GSPMD has no partitioning rule for the custom call and would
        #   otherwise replicate its operands)
    ) -> jnp.ndarray:
        """Single-query attention over an ancestry-indexed beam KV cache.

        Beam search must re-attribute each cache column to the hypothesis that
        now continues it after every reorder. Physically permuting the cache
        (``decode.beam_search.insert_permute_rows``) costs a full cache
        read+write per step and dominates the decode loop (scripts/
        sweep_beam_cost.py: the LM cache alone is ~1 GB at batch 32 beam 10).
        Here the cache NEVER moves: slots are storage, and a tiny (N, Lc)
        int32 ancestry table says which slot within the beam group wrote each
        column of each hypothesis' history. The attend becomes a group attend
        — every query attends over all ``beam * Lc`` columns of its group
        with a one-hot ``anc[n, t] == j`` mask on the logits. Exactly one j
        is valid per live column, so the masked softmax over (j, t) equals
        the softmax over the gathered history — same numerics as
        ``attend_kv_append`` on a physically-reordered cache, at 1x cache
        read per step instead of read+write+read.

        The cache layout is group-major (B, H, beam, Lc, dk) so both matmuls
        are single ``dot_general``s with batch dims (B, H) and the beam*Lc
        columns merged into one contraction/output axis — B*H matmuls of
        (beam, dk) x (dk, beam*Lc), big enough to stream the cache at HBM
        bandwidth. A row-major (N, H, Lc, dk) layout instead yields B*beam*H
        tiny (beam, dk) x (dk, Lc) matmuls (~13 KB of K each at the flagship
        decode shape) which XLA lowers at a fraction of peak (measured 30
        ms/step at batch 32 vs the ~2 ms traffic bound).
        """
        # int8-quantized cache sides arrive as (payload, per-column scale)
        # tuples (ops/kv_quant.py; opt-in cache_dtype: int8)
        quantized = isinstance(k, tuple)
        if quantized:
            k_pay, k_scale = k
            v_pay, v_scale = v
            b, h, km, lc, dk = k_pay.shape
        else:
            b, h, km, lc, dk = k.shape
        n = b * beam
        q = q_heads  # (N, H, 1, dk)
        scale = 1.0 / jnp.sqrt(jnp.asarray(dk, jnp.float32))
        qg = q[:, :, 0].reshape(b, beam, h, dk).transpose(0, 2, 1, 3)
        on_tpu = is_tpu_backend()
        use_fused = (
            (on_tpu and _FUSED_GROUP_ATTEND) if fused is None else bool(fused)
        )
        if use_fused and quantized:
            from tailored_avsr_tpu.ops.group_attend import group_attend_anc_q
            from tailored_avsr_tpu.parallel.mesh import shard_pallas_over_data

            if anc.shape[1] < lc:
                anc = jnp.pad(
                    anc, ((0, 0), (0, lc - anc.shape[1])), constant_values=-1
                )
            call = functools.partial(
                group_attend_anc_q, width=width, interpret=not on_tpu
            )
            call = shard_pallas_over_data(call, mesh, b, n_arrays=8, n_outs=1)
            out = call(
                k_pay, k_scale, v_pay, v_scale, qg,
                k_new[:, :, 0].reshape(b, beam, h, dk).transpose(0, 2, 1, 3),
                v_new[:, :, 0].reshape(b, beam, h, dk).transpose(0, 2, 1, 3),
                anc[:, :lc].reshape(b, beam, lc), pos,
            )  # (B, H, i, dk)
            d = h * dk
            out = out.transpose(0, 2, 1, 3).reshape(n, 1, d)
            return self.linear_out(out)
        if quantized:
            # XLA / off-TPU twin: dequantize and fall through to the exact
            # formulation below (materializes the bf16 cache — debug path)
            from tailored_avsr_tpu.ops.kv_quant import dequantize_cache

            k = dequantize_cache(k_pay, k_scale, q_heads.dtype)
            v = dequantize_cache(v_pay, v_scale, q_heads.dtype)
        if use_fused:
            # Pallas fused path (ops/group_attend.py): the (B, H, i, j, t)
            # logits/probs tensors below are materialized to HBM by XLA —
            # ~6-9 GB/step at the flagship decode shape, several x the cache
            # bytes — while the kernel keeps them in VMEM and reads only the
            # cache (the roofline floor).
            from tailored_avsr_tpu.ops.group_attend import group_attend_anc

            if anc.shape[1] < lc:
                anc = jnp.pad(
                    anc, ((0, 0), (0, lc - anc.shape[1])), constant_values=-1
                )
            call = functools.partial(
                group_attend_anc, width=width, interpret=not on_tpu
            )
            # pod-batched decode: the kernel runs per data shard; inputs are
            # already batch-sharded by the outer jit, so entry/exit is a
            # no-op resharding
            from tailored_avsr_tpu.parallel.mesh import (
                shard_pallas_over_data,
            )

            call = shard_pallas_over_data(call, mesh, b, n_arrays=6, n_outs=1)
            out = call(
                k, v, qg,
                k_new[:, :, 0].reshape(b, beam, h, dk).transpose(0, 2, 1, 3),
                v_new[:, :, 0].reshape(b, beam, h, dk).transpose(0, 2, 1, 3),
                anc[:, :lc].reshape(b, beam, lc), pos,
            )  # (B, H, i, dk)
            d = h * dk
            out = out.transpose(0, 2, 1, 3).reshape(n, 1, d)
            return self.linear_out(out)
        if width is not None and width < lc:
            # CPU/test twin of the kernel's narrowed BlockSpec: a slice here
            # (copy) is fine off the hot path; numerics are identical because
            # columns >= pos-1 are masked dead in both formulations
            k, v, lc = k[:, :, :, :width], v[:, :, :, :width], width
        # (B, H, i, dk) x (B, H, j, t, dk) -> logits (B, H, i, j, t): one
        # dot_general, batch (B, H), rhs free dims (j, t) NOT reshaped
        # together — merging them crosses the cache's padded tile boundaries
        # (Lc is not sublane-aligned) and would force a full relayout copy of
        # every leaf every step
        s = jax.lax.dot_general(
            qg, k, (((3,), (4,)), ((0, 1), (0, 1)))
        ).astype(jnp.float32) * scale  # (B, H, i, j, t)
        if anc.shape[1] < lc:
            # cache Lc is 8-rounded for the Pallas block write; a narrower
            # ancestry table means those pad columns were never written —
            # -1 matches no slot, so they mask out
            anc = jnp.pad(
                anc, ((0, 0), (0, lc - anc.shape[1])), constant_values=-1
            )
        ancg = anc[:, :lc].reshape(b, beam, lc)  # (B, i, t)
        valid = (
            ancg[:, None, :, None, :]
            == jnp.arange(km)[None, None, None, :, None]
        ) & (jnp.arange(lc) < pos - 1)[None, None, None, None, :]
        s = jnp.where(valid, s, MASK_MIN)  # (B, H, i, j, t); valid bcast on H
        s_new = (
            jnp.einsum("nhd,nhd->nh", q[:, :, 0], k_new[:, :, 0]).astype(
                jnp.float32
            )
            * scale
        ).reshape(b, beam, h).transpose(0, 2, 1)  # (B, H, i) self logit
        m = jnp.maximum(jnp.max(s, axis=(3, 4)), s_new)  # (B, H, i)
        p = jnp.exp(s - m[..., None, None]) * valid  # (B, H, i, j, t)
        p_new = jnp.exp(s_new - m)  # (B, H, i)
        lsum = jnp.sum(p, axis=(3, 4)) + p_new  # (B, H, i)
        w = (p / lsum[..., None, None]).astype(v.dtype)
        # (B, H, i, j, t) x (B, H, j, t, dk) -> (B, H, i, dk): contracting
        # dims (j, t), again with no tile-crossing reshape of the cache
        out = jax.lax.dot_general(
            w, v, (((3, 4), (2, 3)), ((0, 1), (0, 1)))
        )
        vn = v_new[:, :, 0].reshape(b, beam, h, dk).transpose(0, 2, 1, 3)
        out = out + ((p_new / lsum).astype(v.dtype))[..., None] * vn
        d = h * dk
        out = out.transpose(0, 2, 1, 3).reshape(n, 1, d)  # heads-major concat
        return self.linear_out(out)

    def attend_kv_mem_grouped(
        self,
        query: jnp.ndarray,  # (N, 1, D) single-step queries, N = B*beam
        k,  # (B, H, T, dk) group-shared cached keys, or (int8, scale) tuple
        v,  # (B, H, T, dk) group-shared cached values, or (int8, scale)
        mask: Optional[jnp.ndarray],  # (B, T) key validity
        beam: int,
    ) -> jnp.ndarray:
        """Cross-attention for beam decode where every row of a beam group
        shares the same memory K/V (the encoder output): the (B, H, T, dk)
        tensors are read once per group instead of ``beam`` times. The
        row-repeated layout (``jnp.repeat(mem_kv, beam)``) costs beam x the
        HBM traffic of the shared memory every decode step — ~196 MB/step at
        batch 32 beam 10 on the flagship decoder vs ~20 MB here.

        ``mem_dtype: int8``: each side arrives as an (int8 payload, per-
        (b, h, t) f32 scale) tuple (ops/kv_quant.py). The key scales fold
        into the logits and the value scales into the softmax weights, so
        both einsums read the int8 payload straight from HBM (XLA fuses the
        upcast into the dot fusion) — memory traffic halves again vs bf16."""
        n, _, d = query.shape
        b = n // beam
        dk = d // self.num_heads
        q = self._heads(self.linear_q(query))  # (N, H, 1, dk)
        qg = q[:, :, 0].reshape(b, beam, self.num_heads, dk).transpose(
            0, 2, 1, 3
        )  # (B, H, i, dk)
        k_scale = v_scale = None
        if isinstance(k, tuple):
            (k, k_scale), (v, v_scale) = k, v  # payloads int8, scales (B,H,T)
        scores = jnp.einsum(
            "bhid,bhtd->bhit", qg, k.astype(qg.dtype)
        ) / jnp.sqrt(jnp.asarray(dk, jnp.float32))
        if k_scale is not None:
            scores = scores.astype(jnp.float32) * k_scale[:, :, None, :]
        attn = _masked_softmax(scores, mask)
        if v_scale is not None:
            attn = attn * v_scale[:, :, None, :]
        attn = attn.astype(qg.dtype)
        out = jnp.einsum(
            "bhit,bhtd->bhid", attn, v.astype(qg.dtype)
        )  # (B, H, i, dk)
        out = out.transpose(0, 2, 1, 3).reshape(n, 1, d)
        return self.linear_out(out)

    def attend_kv_segmented(
        self,
        query: jnp.ndarray,  # (B, 1, D) single-step query input
        k_segs,  # sequence of (B, H, S, dk) cached key segments
        v_segs,  # sequence of (B, H, S, dk) cached value segments
        pos: jnp.ndarray,  # scalar: number of valid cache rows
        seg_len: int,
    ) -> jnp.ndarray:
        """Single-query attention over a length-segmented KV cache.

        Online-softmax accumulation over segments; each segment is guarded by
        ``lax.cond(pos > lo, ...)`` on the scalar position, so segments
        entirely beyond the live prefix cost nothing — numerics identical to
        ``attend_kv`` over the concatenated cache.
        """
        d = query.shape[-1]
        dk = d // self.num_heads
        q = self._heads(self.linear_q(query))  # (B, H, 1, dk)
        bsz, h = q.shape[0], q.shape[1]
        scale = 1.0 / jnp.sqrt(jnp.asarray(dk, jnp.float32))
        m = jnp.full((bsz, h, 1, 1), MASK_MIN, jnp.float32)
        lsum = jnp.zeros((bsz, h, 1, 1), jnp.float32)
        acc = jnp.zeros((bsz, h, 1, dk), jnp.float32)

        for si, (k, v) in enumerate(zip(k_segs, v_segs)):
            lo = si * seg_len

            def compute(carry, k=k, v=v, lo=lo):
                m, lsum, acc = carry
                s = (
                    jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
                    * scale
                )  # (B, H, 1, S)
                valid = (jnp.arange(seg_len) + lo < pos)[None, None, None, :]
                s = jnp.where(valid, s, MASK_MIN)
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new) * valid
                corr = jnp.exp(m - m_new)
                lsum2 = lsum * corr + jnp.sum(p, axis=-1, keepdims=True)
                acc2 = acc * corr + jnp.einsum(
                    "bhqk,bhkd->bhqd", p.astype(v.dtype), v
                ).astype(jnp.float32)
                return m_new, lsum2, acc2

            m, lsum, acc = jax.lax.cond(
                pos > lo, compute, lambda c: c, (m, lsum, acc)
            )
        out = (acc / jnp.maximum(lsum, 1e-30)).astype(query.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(bsz, 1, d)
        return self.linear_out(out)

    def apply_scores(
        self, values: jnp.ndarray, scores: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        """Project values and weight them by precomputed (B,H,Tq,Tk) scores.

        Sim-T post-MHA: no output projection, matching the reference
        (decoder_layer.py:165-189).
        """
        d = values.shape[-1]
        v = self._heads(self.linear_v(values))
        p = self.dropout(scores.astype(v.dtype), deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return out.transpose(0, 2, 1, 3).reshape(values.shape[0], -1, d)


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, 2T-1) -> (B, H, T, T); out[..., i, j] = x[..., i, T-1-i+j].

    The pad/reshape trick: prepend a zero column, fold, drop the first row,
    unfold, keep the first T columns.
    """
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # (b,h,t,2t)
    x = x.reshape(b, h, 2 * t, t)[:, :, 1:, :]  # (b,h,2t-1,t)
    x = x.reshape(b, h, t, 2 * t - 1)
    return x[:, :, :, :t]


def legacy_rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL original shift on a (B, H, T, T) score matrix.

    out[..., i, j] = x[..., i, T-1-(i-j)] for j <= i (relative distance i-j
    reads pos-emb row T-1-(i-j)); entries with j > i are the same fold
    artifacts the legacy espnet/Transformer-XL code produces (the legacy
    encoding has no negative-distance rows).
    """
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # (b,h,t,t+1)
    x = x.reshape(b, h, t + 1, t)[:, :, 1:, :]  # drop first fold row
    return x.reshape(b, h, t, t)


class RelPositionMultiHeadedAttention(nn.Module):
    """Transformer-XL style relative-position MHA with learned u/v biases.

    ``pos_emb`` is the (1, 2T-1, D) table from ``RelPositionalEncoding``, or
    (1, T, D) from ``LegacyRelPositionalEncoding`` when ``legacy=True``
    (pre-2020 espnet 'legacy_rel_selfattn' numerics).
    """

    num_heads: int
    dropout_rate: float = 0.0
    zero_triu: bool = False
    use_flash: bool = False  # Pallas fused kernel (inference / no-dropout path)
    legacy: bool = False  # pre-2020 'legacy_rel_selfattn' shift + (1, T, D) table

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        pos_emb: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d = query.shape[-1]
        h, dk = self.num_heads, d // self.num_heads
        assert d % h == 0

        def split(x, name):
            y = nn.Dense(d, name=name)(x)
            return y.reshape(y.shape[:-1] + (h, dk)).transpose(0, 2, 1, 3)

        q = split(query, "linear_q")  # (B,H,T,dk)
        k = split(key, "linear_k")
        v = split(value, "linear_v")
        # positional projection, no bias (espnet linear_pos has bias=False)
        p = nn.Dense(d, use_bias=False, name="linear_pos")(pos_emb)
        p = p.reshape(p.shape[0], -1, h, dk).transpose(0, 2, 1, 3)  # (1,H,2T-1,dk)

        pos_bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, dk))
        pos_bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, dk))

        q_u = q + pos_bias_u[None, :, None, :].astype(q.dtype)
        q_v = q + pos_bias_v[None, :, None, :].astype(q.dtype)

        flash_ok = (
            self.use_flash
            # the Pallas flash kernels are custom_partitioning primitives with
            # no VJP: inference-only. Gating on dropout_rate==0 used to route
            # TRAINING through them whenever attention dropout was disabled,
            # which crashes at grad time ("Differentiation rule for
            # 'custom_partitioning' not implemented").
            and deterministic
            and (mask is None or mask.ndim == 2)
        )
        # in-kernel Toeplitz pays when the materialized (B, H, T, T) bias
        # would be large (HBM-bound); below ~32MB the streamed-bias kernel is
        # marginally faster (measured on v5e, scripts/bench_flash_relpos.py)
        t_q = q.shape[2]
        bias_bytes = q.shape[0] * h * t_q * t_q * jnp.dtype(q.dtype).itemsize
        if (
            flash_ok
            and not self.legacy
            and not self.zero_triu
            and bias_bytes >= 32 * 1024 * 1024
        ):
            # fully fused path: the Toeplitz rel-pos term is computed inside
            # the kernel (barrel-shifter shift) — no (B, H, T, T) bias in HBM
            from tailored_avsr_tpu.ops.flash_attention import flash_attention_relpos

            out = flash_attention_relpos(q_u, k, v, q_v, p[0], mask=mask)
            out = out.transpose(0, 2, 1, 3).reshape(query.shape[:-1] + (d,))
            return nn.Dense(d, name="linear_out")(out)

        # content-position Toeplitz term (skinny matmul + reshape shift)
        matrix_bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, p)  # (B,H,T,2T-1 | T)
        matrix_bd = legacy_rel_shift(matrix_bd) if self.legacy else rel_shift(matrix_bd)
        if self.zero_triu:
            t = matrix_bd.shape[-2]
            ones = jnp.tril(jnp.ones((t, t), dtype=matrix_bd.dtype))
            matrix_bd = matrix_bd * ones[None, None]

        if flash_ok:
            from tailored_avsr_tpu.ops.flash_attention import flash_attention

            out = flash_attention(q_u, k, v, bias=matrix_bd, mask=mask)
        else:
            matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
            scores = (matrix_ac + matrix_bd) / jnp.sqrt(
                jnp.asarray(dk, jnp.float32)
            ).astype(q.dtype)
            attn = _masked_softmax(scores, mask).astype(v.dtype)
            attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(query.shape[:-1] + (d,))
        return nn.Dense(d, name="linear_out")(out)


class FastSelfAttention(nn.Module):
    """Fastformer additive attention (espnet2.asr.layers.fastformer behavior).

    Linear-time: per-head attention-pooled global query modulates keys, whose
    pooled summary modulates values. Used by the 'fast_selfattn' encoder choice
    (/root/reference/src/encoder/branchformer/encoder.py:251-259).
    """

    num_heads: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, t, d = x.shape
        h, dk = self.num_heads, d // self.num_heads
        assert d % h == 0
        drop = nn.Dropout(self.dropout_rate)

        def pool_weights(scores):  # (B, T, H) -> (B, H, T) softmax over T
            s = scores.transpose(0, 2, 1).astype(jnp.float32) / jnp.sqrt(
                jnp.asarray(dk, jnp.float32)
            )
            if mask is not None:
                s = jnp.where(mask[:, None, :], s, MASK_MIN)
                w = nn.softmax(s, axis=-1)
                w = jnp.where(mask[:, None, :], w, 0.0)
            else:
                w = nn.softmax(s, axis=-1)
            return w.astype(x.dtype)

        query = nn.Dense(d, name="query")(x)
        q_heads = query.reshape(b, t, h, dk).transpose(0, 2, 1, 3)  # (B,H,T,dk)
        q_w = pool_weights(nn.Dense(h, name="query_att")(query))
        pooled_q = jnp.einsum("bht,bhtd->bhd", q_w, q_heads)  # (B,H,dk)
        pooled_q = drop(pooled_q, deterministic=deterministic)

        key = nn.Dense(d, name="key")(x)
        mixed = key * pooled_q.reshape(b, 1, d)  # broadcast global query over time
        k_heads = mixed.reshape(b, t, h, dk).transpose(0, 2, 1, 3)
        k_w = pool_weights(nn.Dense(h, name="key_att")(mixed))
        pooled_k = jnp.einsum("bht,bhtd->bhd", k_w, k_heads)
        pooled_k = drop(pooled_k, deterministic=deterministic)

        value = nn.Dense(d, name="value")(x)
        v_heads = value.reshape(b, t, h, dk).transpose(0, 2, 1, 3)
        weighted_v = v_heads * pooled_k[:, :, None, :]
        out = nn.Dense(d, name="transform")(
            weighted_v.transpose(0, 2, 1, 3).reshape(b, t, d)
        )
        out = drop(out, deterministic=deterministic)
        return out + query
