"""Time-synchronous CTC prefix beam search vs exact enumeration."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.decode.ctc_timesync import ctc_timesync_beam_search
from tailored_avsr_tpu.ops.losses import ctc_loss


def exact_scores(logits, length, max_label_len=3, v=None):
    """Exact log P_ctc(sequence) for every sequence up to max_label_len."""
    v = v or logits.shape[-1]
    out = {}
    for n in range(0, max_label_len + 1):
        for seq in itertools.product(range(1, v), repeat=n):
            if n == 0:
                labels = jnp.zeros((1, 1), jnp.int32)
                ll = jnp.zeros((1,), jnp.int32)
            else:
                labels = jnp.asarray([seq], jnp.int32)
                ll = jnp.asarray([n], jnp.int32)
            loss = ctc_loss(
                logits[None], jnp.asarray([length]), labels, ll, reduce=False
            )
            # infeasible sequences are zeroed by zero_infinity; skip those
            if n + sum(a == b for a, b in zip(seq, seq[1:])) <= length:
                out[seq] = -float(loss[0])
    return out


def test_timesync_matches_exhaustive():
    key = jax.random.PRNGKey(0)
    b, t, v = 2, 6, 5
    logits = jax.random.normal(key, (b, t, v)) * 2.0
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    lengths = jnp.array([6, 4])
    toks, tlens, scores, cscores = ctc_timesync_beam_search(
        log_probs, lengths, beam_size=16, pre_beam=v - 1, max_len=8
    )
    # no fusion configured: the combined score IS the ctc score
    np.testing.assert_allclose(np.asarray(scores), np.asarray(cscores))
    for bi in range(b):
        exact = exact_scores(logits[bi], int(lengths[bi]))
        best_seq = max(exact, key=exact.get)
        got = tuple(int(x) for x in np.asarray(toks[bi, 0, : int(tlens[bi, 0])]))
        assert got == best_seq, (got, best_seq, exact)
        # beam scores are exact-or-lower (pruned prefixes that regenerate the
        # same sequence lose their mass) and close for the dominant sequences
        for ki in range(4):
            s = tuple(int(x) for x in np.asarray(toks[bi, ki, : int(tlens[bi, ki])]))
            if s in exact:
                assert float(scores[bi, ki]) <= exact[s] + 1e-4
                assert abs(float(scores[bi, ki]) - exact[s]) < 0.2
        # and the n-best order must agree with the exact order on shared items
        beam_seqs = [
            tuple(int(x) for x in np.asarray(toks[bi, ki, : int(tlens[bi, ki])]))
            for ki in range(4)
        ]
        beam_known = [s for s in beam_seqs if s in exact]
        exact_order = sorted(exact, key=exact.get, reverse=True)
        shared = [s for s in exact_order if s in beam_known]
        assert beam_known == shared


def test_timesync_length_bonus_and_batch_masking():
    key = jax.random.PRNGKey(1)
    b, t, v = 2, 5, 4
    log_probs = jax.nn.log_softmax(jax.random.normal(key, (b, t, v)), -1)
    lengths = jnp.array([5, 3])
    t0, l0, s0, _ = ctc_timesync_beam_search(log_probs, lengths, beam_size=4,
                                             pre_beam=3, max_len=6)
    # a large insertion bonus must favor longer outputs
    t1, l1, s1, c1 = ctc_timesync_beam_search(log_probs, lengths, beam_size=4,
                                              pre_beam=3, max_len=6,
                                              penalty=5.0)
    # fusion = score - ctc = penalty * emitted length
    np.testing.assert_allclose(
        np.asarray(s1 - c1), 5.0 * np.asarray(l1), atol=1e-4)
    assert int(l1[0, 0]) >= int(l0[0, 0])
    # frames past `lengths` must not affect the result
    lp2 = log_probs.at[1, 3:].set(jnp.log(jnp.ones(v) / v) * 0 + 7.0)
    t2, l2, s2, _ = ctc_timesync_beam_search(lp2, lengths, beam_size=4,
                                             pre_beam=3, max_len=6)
    np.testing.assert_array_equal(np.asarray(t0[1]), np.asarray(t2[1]))
    np.testing.assert_allclose(np.asarray(s0[1]), np.asarray(s2[1]), atol=1e-5)


def test_speech2text_timesync_mode(tmp_path):
    """decode_mode: timesync runs frame-synchronous CTC beam search with a
    final batched attention-rescoring pass, through the public engine."""
    import types
    from tailored_avsr_tpu.inference import Speech2Text

    tok = tmp_path / "tokens.txt"
    tok.write_text("\n".join(["<blank>", "<unk>"] +
                              [chr(65 + i) for i in range(6)] + ["<sos/eos>"]))
    base = dict(
        task="asr",
        token_list=str(tok),
        frontend="default",
        frontend_conf={"n_fft": 512, "win_length": 400, "hop_length": 160,
                       "n_mels": 20},
        encoder="branchformer",
        encoder_conf={"output_size": 24, "attention_heads": 4,
                      "linear_units": 32, "cgmlp_linear_units": 32,
                      "cgmlp_conv_kernel": 7, "num_blocks": 1,
                      "input_layer": "conv2d", "dropout_rate": 0.0},
        decoder="transformer",
        decoder_conf={"attention_heads": 4, "linear_units": 32,
                      "num_blocks": 1, "dropout_rate": 0.0},
        model="espnet", model_conf={"ctc_weight": 0.3},
        inference_conf={"beam_size": 3, "ctc_weight": 0.5, "nbest": 3,
                        "decode_mode": "timesync"},
    )
    rng = np.random.RandomState(0)
    B, S = 2, 640 * 6
    batch = {
        "speech": (rng.randn(B, S) * 0.1).astype(np.float32),
        "speech_lengths": np.full((B,), S, np.int32),
        "text": np.ones((B, 4), np.int32),
        "text_lengths": np.full((B,), 4, np.int32),
    }
    s2t = Speech2Text(types.SimpleNamespace(**base))
    nbest = s2t.nbest(batch)
    assert len(nbest) == B and len(nbest[0]) == 3
    # scores sorted best-first; hypotheses are valid token strings
    for hyps in nbest:
        scores = [h[3] for h in hyps]
        assert scores == sorted(scores, reverse=True)
        for text, toks_, ids, _ in hyps:
            assert all(0 < i < len(s2t.token_list) for i in ids)


def test_timesync_chunked_matches_single_pass():
    """Chunk-chained search state == one pass over concatenated frames (the
    streaming partial-hypothesis surface)."""
    from tailored_avsr_tpu.decode.ctc_timesync import (
        ctc_timesync_chunk,
        timesync_best,
        timesync_init_state,
    )

    key = jax.random.PRNGKey(7)
    b, t, v = 2, 11, 5
    lp = jax.nn.log_softmax(jax.random.normal(key, (b, t, v)) * 1.5, -1)
    lengths = jnp.full((b,), t)
    want = ctc_timesync_beam_search(lp, lengths, beam_size=4, pre_beam=4,
                                    max_len=8, penalty=0.3)
    state = timesync_init_state(b, 4, 8)
    for a, z in [(0, 4), (4, 5), (5, 11)]:
        state = ctc_timesync_chunk(
            lp[:, a:z], jnp.full((b,), z - a), state,
            beam_size=4, pre_beam=4, penalty=0.3,
        )
        # partial hypotheses are readable mid-stream
        toks, lens, scores, _ = timesync_best(state)
        assert np.isfinite(float(scores[0, 0]))
    got = timesync_best(state)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), atol=1e-5)


def test_ctc_only_model_beam_decodes_via_timesync(tmp_path):
    """A ctc_weight=1.0 model (no decoder) decodes with the frame-sync beam
    instead of crashing on the label-sync decoder dereference."""
    import types
    from tailored_avsr_tpu.inference import Speech2Text

    tok = tmp_path / "tokens.txt"
    tok.write_text("\n".join(["<blank>", "<unk>"] +
                              [chr(65 + i) for i in range(6)] + ["<sos/eos>"]))
    cfg = types.SimpleNamespace(
        task="asr", token_list=str(tok),
        frontend="default",
        frontend_conf={"n_fft": 512, "win_length": 400, "hop_length": 160,
                       "n_mels": 20},
        encoder="branchformer",
        encoder_conf={"output_size": 24, "attention_heads": 4,
                      "linear_units": 32, "cgmlp_linear_units": 32,
                      "cgmlp_conv_kernel": 7, "num_blocks": 1,
                      "input_layer": "conv2d", "dropout_rate": 0.0},
        model="espnet", model_conf={"ctc_weight": 1.0},
        inference_conf={"beam_size": 3, "ctc_weight": 1.0},
    )
    rng = np.random.RandomState(0)
    B, S = 2, 640 * 5
    batch = {"speech": (rng.randn(B, S) * 0.1).astype(np.float32),
             "speech_lengths": np.full((B,), S, np.int32),
             "text": np.ones((B, 4), np.int32),
             "text_lengths": np.full((B,), 4, np.int32)}
    s2t = Speech2Text(cfg)
    assert s2t.model.decoder is None
    res = s2t(batch)
    assert len(res) == B
    for text, toks_, ids in res:
        assert all(0 < i < len(s2t.token_list) for i in ids)
