"""Chunked streaming over the contextual-block encoder == offline batch run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tailored_avsr_tpu.decode.streaming import ContextualBlockStreamer
from tailored_avsr_tpu.models.asr_model import ASRModel
from tailored_avsr_tpu.models.ctc import CTCHead
from tailored_avsr_tpu.tasks.common import build_encoder

V, D, F = 7, 16, 20


def make_model(layer="contextual_block_transformer", input_layer="conv2d"):
    enc = build_encoder(layer, {
        "output_size": D, "attention_heads": 2, "linear_units": 24,
        "num_blocks": 2, "block_size": 8, "hop_size": 4,
        "input_layer": input_layer, "dropout_rate": 0.0,
        "positional_dropout_rate": 0.0,
    })
    return ASRModel(vocab_size=V, encoder=enc, ctc=CTCHead(V), ctc_weight=1.0)


@pytest.mark.parametrize("layer", [
    "contextual_block_transformer", "contextual_block_conformer",
])
def test_streaming_matches_batch(layer):
    key = jax.random.PRNGKey(0)
    model = make_model(layer)
    B, T = 2, 245  # odd length: exercises subsampling + partial-tail flush
    feats = jax.random.normal(key, (B, T, F))
    flens = jnp.full((B,), T)
    text = jnp.array([[1, 2, -1], [3, -1, -1]])
    variables = model.init(key, feats, flens, text, jnp.array([2, 1]))
    want, olens, _ = model.apply(variables, feats, flens, method="encode")
    want = np.asarray(want)

    st = ContextualBlockStreamer(model, variables)
    st.reset(B)
    got, got_ids = [], []
    np_feats = np.asarray(feats)
    cuts = [0, 37, 101, 151, 164, 245]  # irregular chunk sizes
    for a, b in zip(cuts, cuts[1:]):
        y, ids = st.accept(np_feats[:, a:b])
        got.append(y), got_ids.append(ids)
    y, ids = st.finalize()
    got.append(y), got_ids.append(ids)
    got = np.concatenate(got, axis=1)
    got_ids = np.concatenate(got_ids, axis=1)

    assert got.shape[1] == int(olens[0]) == want.shape[1]
    np.testing.assert_allclose(got, want, atol=2e-5)
    # greedy ids agree with the batch CTC argmax
    batch_ids = model.apply(
        variables, jnp.asarray(want), method=lambda m, x: m.ctc.argmax(x)
    )
    np.testing.assert_array_equal(got_ids, np.asarray(batch_ids))


def test_streaming_linear_input_layer():
    key = jax.random.PRNGKey(1)
    model = make_model(input_layer="linear")
    B, T = 1, 30
    feats = jax.random.normal(key, (B, T, F))
    flens = jnp.full((B,), T)
    variables = model.init(key, feats, flens, jnp.array([[1, -1]]), jnp.array([1]))
    want, olens, _ = model.apply(variables, feats, flens, method="encode")
    st = ContextualBlockStreamer(model, variables)
    st.reset(B)
    parts = [np.asarray(st.accept(np.asarray(feats[:, a:b]))[0])
             for a, b in [(0, 11), (11, 25), (25, 30)]]
    parts.append(np.asarray(st.finalize()[0]))
    got = np.concatenate(parts, axis=1)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)


def test_streaming_rejects_non_block_encoder():
    key = jax.random.PRNGKey(2)
    from tailored_avsr_tpu.models.branchformer import BranchformerEncoder

    enc = BranchformerEncoder(output_size=D, attention_heads=2,
                              linear_units=24, cgmlp_linear_units=24,
                              cgmlp_conv_kernel=7, num_blocks=1,
                              input_layer="conv2d", dropout_rate=0.0)
    model = ASRModel(vocab_size=V, encoder=enc, ctc=CTCHead(V), ctc_weight=1.0)
    with pytest.raises(ValueError):
        ContextualBlockStreamer(model, {})


def test_transducer_streamer_matches_offline():
    """Chunked transducer decoding == offline greedy transducer over the full
    utterance (prediction state + last label carry across chunks)."""
    from argparse import Namespace

    from tailored_avsr_tpu.decode.streaming import TransducerStreamer
    from tailored_avsr_tpu.ops.rnnt import transducer_greedy_decode
    from tailored_avsr_tpu.tasks import ASRTask

    cfg = Namespace(
        task="asr",
        tokens={"token_list_path": None, "token_type": "char"},
        frontend="none",
        encoder="contextual_block_transformer",
        encoder_conf={"output_size": D, "attention_heads": 2,
                      "linear_units": 24, "num_blocks": 2, "block_size": 8,
                      "hop_size": 4, "input_layer": "conv2d",
                      "dropout_rate": 0.0},
        decoder="transducer",
        decoder_conf={"embed_size": D, "hidden_size": D, "num_layers": 1,
                      "dropout_rate": 0.0},
        joint_net_conf={"joint_space_size": 16},
        model="espnet", model_conf={"ctc_weight": 0.3},
        input_size=F,
    )
    token_list = [f"t{i}" for i in range(V)]
    model = ASRTask.build_model(cfg, token_list)
    key = jax.random.PRNGKey(3)
    B, T = 2, 203
    feats = jax.random.normal(key, (B, T, F))
    flens = jnp.full((B,), T)
    text = jnp.array([[1, 2, -1], [3, -1, -1]])
    variables = model.init(key, feats, flens, text, jnp.array([2, 1]))

    # offline: batch encode + one-pass greedy transducer
    enc_out, enc_lens, _ = model.apply(variables, feats, flens, method="encode")

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

    init_state = model.apply(
        variables, B, method=lambda m, b: m.prediction_network.initial_state(b)
    )
    toks, cnt = transducer_greedy_decode(
        enc_out, enc_lens, pred_apply, joint_apply, init_state
    )
    offline = [
        [int(x) for x in np.asarray(toks[i, : int(cnt[i])])] for i in range(B)
    ]

    st = TransducerStreamer(model, variables)
    st.reset(B)
    streamed = [[] for _ in range(B)]
    np_feats = np.asarray(feats)
    for a, b in [(0, 57), (57, 123), (123, 170), (170, 203)]:
        out = st.accept(np_feats[:, a:b])
        for i in range(B):
            streamed[i].extend(int(x) for x in out[i])
    out = st.finalize()
    for i in range(B):
        streamed[i].extend(int(x) for x in out[i])
    assert streamed == offline, (streamed, offline)
    assert any(len(s) > 0 for s in streamed)  # nontrivial decode


def test_timesync_streamer_matches_offline():
    """Streaming timesync partial-hypothesis decoding == offline timesync
    beam search over the full utterance; partials are readable per chunk."""
    from tailored_avsr_tpu.decode.ctc_timesync import ctc_timesync_beam_search
    from tailored_avsr_tpu.decode.streaming import TimesyncStreamer

    key = jax.random.PRNGKey(9)
    model = make_model("contextual_block_transformer")
    B, T = 2, 203
    feats = jax.random.normal(key, (B, T, F))
    flens = jnp.full((B,), T)
    variables = model.init(key, feats, flens, jnp.array([[1, -1], [2, -1]]),
                           jnp.array([1, 1]))
    # offline: batch encode -> ctc log-softmax -> one-pass timesync
    enc, enc_lens, _ = model.apply(variables, feats, flens, method="encode")
    logp = model.apply(variables, enc, method=lambda m, x: m.ctc.log_softmax(x))
    wt, wl, ws, _ = ctc_timesync_beam_search(
        logp, enc_lens, beam_size=4, pre_beam=4, max_len=60, penalty=0.2)

    st = TimesyncStreamer(model, variables, beam_size=4, pre_beam=4,
                          penalty=0.2, max_tokens=60)
    st.reset(B)
    np_feats = np.asarray(feats)
    partials = []
    for a, b in [(0, 60), (60, 120), (120, 203)]:
        partials.append(st.accept(np_feats[:, a:b]))
    final = st.finalize()
    for i in range(B):
        want = [int(x) for x in np.asarray(wt[i, 0, : int(wl[i, 0])])]
        got = [int(x) for x in final[i]]
        assert got == want, (got, want)
    # partial hypotheses were produced during the stream
    assert any(len(p[0]) > 0 for p in partials)
