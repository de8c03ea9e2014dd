"""Online (chunked streaming) recognition over the contextual-block encoder.

Capability parity with espnet's ``BatchBeamSearchOnlineSim`` streaming hook
imported by the reference (/root/reference/src/inference/avsr_inference.py:
296-301; exposed but unused by shipped configs — SURVEY.md §5.7): feed feature
frames as they arrive, get encoder frames + incremental greedy-CTC tokens back
with bounded latency (the contextual-block look-ahead).

Exactness: block-by-block processing reproduces the batch
``ContextualBlockEncoder.__call__`` bit-for-bit (information crosses block
boundaries only through per-layer context tokens, which the streamer carries
as state), so "streamed" and "offline" outputs agree — tested in
tests/test_streaming.py.

TPU-first design: one jitted chunk function per (chunk-shape, n_blocks)
signature — embed window (VALID convs re-run only on the receptive-field
overlap), static unroll over the chunk's complete blocks, per-layer context
tokens threaded through, greedy CTC argmax on the emitted hop frames. Host
side keeps only a numpy tail of raw features and two counters.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tailored_avsr_tpu.ops.posenc import abs_pos_table
from tailored_avsr_tpu.ops.subsampling import subsampled_length

_MAX_POS = 5000  # reference pos-emb cap (src/encoder/branchformer/encoder.py:88)


class ContextualBlockStreamer:
    """Streaming wrapper around an ASR model whose encoder is a
    ``ContextualBlockEncoder`` (input_layer 'conv2d' or 'linear').

    Usage::

        st = ContextualBlockStreamer(model, variables)
        st.reset(batch_size=1)
        for chunk in feature_chunks:          # (B, C, F) log-mel frames
            enc, ids = st.accept(chunk)       # may be empty before warm-up
        enc, ids = st.finalize()              # flush the partial tail
    """

    def __init__(self, model, variables, max_positions: int = _MAX_POS):
        enc = model.encoder
        from tailored_avsr_tpu.models.contextual_block import (
            ContextualBlockEncoder,
        )

        if not isinstance(enc, ContextualBlockEncoder):
            raise ValueError(
                "streaming needs encoder 'contextual_block_transformer' or "
                "'contextual_block_conformer'"
            )
        if enc.pos_enc_layer_type != "abs_pos":
            raise NotImplementedError(
                "streaming supports pos_enc_layer_type 'abs_pos' (the "
                "contextual-block registry default)"
            )
        if enc.input_layer == "conv2d":
            self._factor, self._rfield = 4, 7
        elif enc.input_layer == "linear":
            self._factor, self._rfield = 1, 1
        else:
            raise NotImplementedError(
                f"streaming input_layer {enc.input_layer!r} (use conv2d/linear)"
            )
        self.model, self.variables = model, variables
        self.max_positions = int(max_positions)
        self.enc = enc
        self.hop, self.blk = enc.hop_size, enc.block_size
        self.num_layers = enc.num_blocks
        self._jit_cache: Dict = {}
        self.reset(1)

    # ------------------------------------------------------------- state --
    def reset(self, batch_size: int) -> None:
        self.batch = batch_size
        self._raw = np.zeros((batch_size, 0, 0), np.float32)  # feature tail
        self._raw_off = 0  # global index of self._raw[:, 0]
        self._n_raw = 0  # total raw frames seen
        self._n_blocks = 0  # completed blocks emitted
        d = self.enc.output_size
        self._ctx = jnp.zeros((self.num_layers, batch_size, d))
        self._first = True

    def _embedded_len(self, n_raw: int) -> int:
        if self._factor == 1:  # 'linear' embed: no temporal subsampling
            return n_raw
        return int(subsampled_length(n_raw, self._factor))

    # --------------------------------------------------------- internals --
    def _embed_method(self, m, raw, e0):
        """Embed a raw-feature window; global pos-enc offset e0 (traced)."""
        enc = m.encoder
        if enc.input_layer == "conv2d":
            h = enc.embed_conv(raw)
        else:
            h = enc.embed_dropout(
                enc.embed_norm(enc.embed_linear(raw)), deterministic=True
            )
        d = h.shape[-1]
        pe = jnp.asarray(abs_pos_table(self.max_positions, d), h.dtype)
        win = jax.lax.dynamic_slice_in_dim(pe, e0, h.shape[1], axis=0)
        return h * jnp.asarray(np.sqrt(d), h.dtype) + win[None]

    def _block_method(self, m, frames, bmask, ctx, first):
        """One block through all layers. Returns (out_frames, new_ctx)."""
        enc = m.encoder
        b = frames.shape[0]
        denom = jnp.maximum(bmask.sum(-1, keepdims=True), 1)
        if enc.init_average:
            cur = (frames * bmask[..., None]).sum(1) / denom
        else:
            cur = frames[:, 0]
        has_prev = jnp.broadcast_to(jnp.logical_not(first), (b, 1))
        x, new_ctx = frames, []
        for l, layer in enumerate(enc.layers):
            new_ctx.append(cur)
            seq = jnp.concatenate([ctx[l][:, None], x, cur[:, None]], axis=1)
            smask = jnp.concatenate(
                [has_prev, bmask, jnp.ones((b, 1), bool)], axis=1
            )
            out, _ = layer(seq, None, smask, deterministic=True)
            x, cur = out[:, 1:-1], out[:, -1]
        return x, jnp.stack(new_ctx)

    def _chunk_method(self, m, raw, ctx, first, e0, n_blocks, tail_valid):
        """Embed a window and process ``n_blocks`` consecutive blocks.

        raw covers embedded frames [e0, e0 + (n_blocks-1)*hop + blk);
        tail_valid = number of valid embedded frames in the window (static;
        < window length only in the finalize call, where the rest is pad).
        """
        hop, blk = self.hop, self.blk
        need = (n_blocks - 1) * hop + blk
        emb = self._embed_method(m, raw, e0)
        if emb.shape[1] < need:  # finalize: zero-pad like the batch path
            emb = jnp.pad(emb, ((0, 0), (0, need - emb.shape[1]), (0, 0)))
        valid = jnp.arange(need)[None, :] < tail_valid  # (1, need)
        valid = jnp.broadcast_to(valid, (emb.shape[0], need))
        emb = jnp.where(valid[..., None], emb, 0.0)
        outs = []
        for i in range(n_blocks):
            frames = jax.lax.dynamic_slice_in_dim(emb, i * hop, blk, axis=1)
            bmask = jax.lax.dynamic_slice_in_dim(valid, i * hop, blk, axis=1)
            x, ctx = self._block_method(
                m, frames, bmask, ctx, jnp.logical_and(first, i == 0)
            )
            outs.append(x[:, :hop])
        y = jnp.concatenate(outs, axis=1)  # (B, n_blocks*hop, D)
        if self.enc.normalize_before:
            y = m.encoder.after_norm(y)
        y = jnp.where(valid[:, : y.shape[1], None], y, 0.0)
        ids = m.ctc.argmax(y)
        return y, ids, ctx

    def _run_chunk(self, raw_win: np.ndarray, e0: int, n_blocks: int,
                   tail_valid: int):
        need = (n_blocks - 1) * self.hop + self.blk
        if e0 + need > self.max_positions:
            # dynamic_slice would silently clamp and break the bit-exactness
            # contract with the offline encoder — fail loudly instead
            raise RuntimeError(
                f"stream exceeds max_positions={self.max_positions} embedded "
                f"frames (needs {e0 + need}); construct the streamer with a "
                "larger max_positions (the reference caps its pos-emb table "
                "at 5000, src/encoder/branchformer/encoder.py:88)"
            )
        key = (raw_win.shape, n_blocks, tail_valid)
        if key not in self._jit_cache:
            def fn(variables, raw, ctx, first, e0):
                return self.model.apply(
                    variables, raw, ctx, first, e0, n_blocks, tail_valid,
                    method=self._chunk_method,
                )
            self._jit_cache[key] = jax.jit(fn)
        y, ids, ctx = self._jit_cache[key](
            self.variables, jnp.asarray(raw_win), self._ctx,
            jnp.asarray(self._first), jnp.asarray(e0, jnp.int32),
        )
        self._ctx = ctx
        self._first = False
        return y, ids

    # ------------------------------------------------------------ public --
    def accept(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Feed (B, C, F) new feature frames; returns (enc_frames, ctc_ids)
        for every block completed by this chunk (possibly empty)."""
        feats = np.asarray(feats, np.float32)
        if self._raw.shape[2] == 0:
            self._raw = np.zeros((self.batch, 0, feats.shape[2]), np.float32)
        self._raw = np.concatenate([self._raw, feats], axis=1)
        self._n_raw += feats.shape[1]
        e_avail = self._embedded_len(self._n_raw)
        n_ready = max(0, (e_avail - self.blk) // self.hop + 1) - self._n_blocks
        if n_ready <= 0:
            d = self.enc.output_size
            return (np.zeros((self.batch, 0, d), np.float32),
                    np.zeros((self.batch, 0), np.int32))
        e0 = self._n_blocks * self.hop
        e1 = e0 + (n_ready - 1) * self.hop + self.blk
        r0 = self._factor * e0
        r1 = min(self._n_raw, self._factor * (e1 - 1) + self._rfield)
        win = self._raw[:, r0 - self._raw_off : r1 - self._raw_off]
        need = (n_ready - 1) * self.hop + self.blk
        y, ids = self._run_chunk(win, e0, n_ready, tail_valid=need)
        self._n_blocks += n_ready
        # drop raw frames no longer needed (left edge of the next window)
        keep_from = self._factor * (self._n_blocks * self.hop)
        cut = max(0, keep_from - self._raw_off)
        self._raw = self._raw[:, cut:]
        self._raw_off += cut
        return np.asarray(y), np.asarray(ids)

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        """Flush: process the remaining partial tail (pad + mask like the
        batch encoder) and return its encoder frames + greedy ids."""
        e_avail = self._embedded_len(self._n_raw)
        e_done = self._n_blocks * self.hop
        if e_avail <= e_done:
            d = self.enc.output_size
            return (np.zeros((self.batch, 0, d), np.float32),
                    np.zeros((self.batch, 0), np.int32))
        n_rest = -(-(e_avail - e_done) // self.hop)  # ceil
        e0 = e_done
        r0 = self._factor * e0
        win = self._raw[:, r0 - self._raw_off :]
        y, ids = self._run_chunk(
            win, e0, n_rest, tail_valid=e_avail - e_done
        )
        emit = e_avail - e_done
        self._n_blocks += n_rest
        return np.asarray(y)[:, :emit], np.asarray(ids)[:, :emit]


class TransducerStreamer:
    """Streaming transducer recognition: chunked contextual-block encoding +
    chainable greedy transducer decoding (ops/rnnt.py
    ``transducer_greedy_chunk``).

    The prediction-network state and last emitted label carry across chunks,
    so the streamed token sequence is identical to offline greedy transducer
    decoding over the full utterance — the canonical production streaming-ASR
    configuration (bounded-latency encoder + frame-synchronous transducer).
    Requires an ASR model with a ContextualBlockEncoder and transducer heads
    (``decoder: transducer`` in the task config).
    """

    def __init__(self, model, variables, max_symbols_per_frame: int = 3,
                 max_positions: int = _MAX_POS):
        if model.joint_network is None or model.prediction_network is None:
            raise ValueError("TransducerStreamer needs a transducer model "
                             "(joint + prediction networks)")
        self.model, self.variables = model, variables
        self.max_symbols = int(max_symbols_per_frame)
        self.enc_stream = ContextualBlockStreamer(
            model, variables, max_positions=max_positions
        )
        self._jit_cache: Dict = {}
        self.reset(1)

    def reset(self, batch_size: int) -> None:
        self.batch = batch_size
        self.enc_stream.reset(batch_size)
        init_state = self.model.apply(
            self.variables, batch_size,
            method=lambda m, b: m.prediction_network.initial_state(b),
        )
        self._carry = (
            init_state, jnp.full((batch_size,), -1, jnp.int32)
        )

    def _decode_chunk(self, enc_frames: np.ndarray, valid: np.ndarray):
        from tailored_avsr_tpu.ops.rnnt import transducer_greedy_chunk

        key = enc_frames.shape
        if key not in self._jit_cache:
            model, variables = self.model, self.variables
            ms = self.max_symbols

            def fn(variables, enc, vlen, carry):
                def pred_apply(state, label):
                    return model.apply(
                        variables, state, label,
                        method=lambda m, *a: m.prediction_network.step(*a),
                    )

                def joint_apply(enc_t, g):
                    return model.apply(
                        variables, enc_t[:, None, None], g[:, None, None],
                        method=lambda m, *a: m.joint_network(*a),
                    ).reshape(enc_t.shape[0], -1)

                return transducer_greedy_chunk(
                    enc, vlen, pred_apply, joint_apply, carry,
                    max_symbols_per_frame=ms,
                )

            self._jit_cache[key] = jax.jit(fn)
        tokens, count, self._carry = self._jit_cache[key](
            self.variables, jnp.asarray(enc_frames), jnp.asarray(valid),
            self._carry,
        )
        toks = np.asarray(tokens)
        cnt = np.asarray(count)
        return [list(toks[i, : cnt[i]]) for i in range(toks.shape[0])]

    def accept(self, feats: np.ndarray):
        """Feed (B, C, F) feature frames; returns per-row lists of NEW token
        ids emitted by the blocks completed by this chunk."""
        y, _ = self.enc_stream.accept(feats)
        if y.shape[1] == 0:
            return [[] for _ in range(self.batch)]
        valid = np.full((self.batch,), y.shape[1], np.int32)
        return self._decode_chunk(y, valid)

    def finalize(self):
        """Flush the encoder tail and return its newly emitted token ids."""
        y, _ = self.enc_stream.finalize()
        if y.shape[1] == 0:
            return [[] for _ in range(self.batch)]
        valid = np.full((self.batch,), y.shape[1], np.int32)
        return self._decode_chunk(y, valid)


class TimesyncStreamer:
    """Streaming recognition with PARTIAL BEAM HYPOTHESES: chunked
    contextual-block encoding + the chunk-chainable frame-synchronous CTC
    prefix beam search (decode/ctc_timesync.py).

    Each ``accept``/``finalize`` returns the current best partial hypothesis
    per utterance (token ids); the carried beam state makes the final result
    identical to offline ``ctc_timesync_beam_search`` over the whole
    utterance. ``nbest()`` exposes the live n-best at any point.
    """

    def __init__(self, model, variables, beam_size: int = 10,
                 pre_beam: int = 10, penalty: float = 0.0,
                 max_tokens: int = 200, max_positions: int = _MAX_POS):
        self.model, self.variables = model, variables
        self.beam_size = int(beam_size)
        self.pre_beam = int(pre_beam)
        self.penalty = float(penalty)
        self.max_tokens = int(max_tokens)
        self.enc_stream = ContextualBlockStreamer(
            model, variables, max_positions=max_positions
        )
        self._logp_jit = None
        self.reset(1)

    def reset(self, batch_size: int) -> None:
        from tailored_avsr_tpu.decode.ctc_timesync import timesync_init_state

        self.batch = batch_size
        self.enc_stream.reset(batch_size)
        self._state = timesync_init_state(
            batch_size, self.beam_size, self.max_tokens
        )

    def _advance(self, enc_frames: np.ndarray):
        from tailored_avsr_tpu.decode.ctc_timesync import ctc_timesync_chunk

        if self._logp_jit is None:
            model = self.model

            def logp(variables, enc):
                return model.apply(
                    variables, enc, method=lambda m, x: m.ctc.log_softmax(x)
                )

            self._logp_jit = jax.jit(logp)
        lp = self._logp_jit(self.variables, jnp.asarray(enc_frames))
        self._state = ctc_timesync_chunk(
            lp, jnp.full((self.batch,), lp.shape[1]), self._state,
            beam_size=self.beam_size, pre_beam=self.pre_beam,
            penalty=self.penalty,
        )

    def nbest(self):
        """Current (tokens (B, K, L), lengths (B, K), scores (B, K))."""
        from tailored_avsr_tpu.decode.ctc_timesync import timesync_best

        toks, lens, scores, _ = timesync_best(self._state)
        return np.asarray(toks), np.asarray(lens), np.asarray(scores)

    def _best_partial(self):
        toks, lens, _ = self.nbest()
        return [list(toks[i, 0, : lens[i, 0]]) for i in range(self.batch)]

    def accept(self, feats: np.ndarray):
        """Feed (B, C, F) feature frames; returns the best PARTIAL hypothesis
        per utterance so far (token id lists)."""
        y, _ = self.enc_stream.accept(feats)
        if y.shape[1]:
            self._advance(y)
        return self._best_partial()

    def finalize(self):
        """Flush the encoder tail; returns the final best hypotheses —
        identical to offline timesync decoding of the full utterance."""
        y, _ = self.enc_stream.finalize()
        if y.shape[1]:
            self._advance(y)
        return self._best_partial()
