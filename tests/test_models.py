"""Model-layer tests: Branchformer/Tailored/Conventional encoders, fusion,
E2E ASR/VSR/AVSR models, decoders, Mask-CTC, LM (contracts per SURVEY.md §2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tailored_avsr_tpu.models import (
    ASRModel,
    AVSRModel,
    AdaptiveAudioVisualFusion,
    BranchformerEncoder,
    CTCHead,
    Conv3dResNet18,
    ConventionalEncoder,
    DefaultEmbeddingLayerForAVSR,
    MLMDecoder,
    MaskCTCModel,
    SimTDecoder,
    TailoredEncoder,
    TransformerDecoder,
    TransformerLM,
)

D = 32
V = 11


def small_branchformer(**kw):
    cfg = dict(
        output_size=D,
        attention_heads=4,
        linear_units=48,
        cgmlp_linear_units=48,
        cgmlp_conv_kernel=7,
        num_blocks=2,
        input_layer="conv2d",
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
    )
    cfg.update(kw)
    return BranchformerEncoder(**cfg)


def test_branchformer_encoder_shapes():
    key = jax.random.PRNGKey(0)
    enc = small_branchformer()
    x = jax.random.normal(key, (2, 37, 20))
    ilens = jnp.array([37, 25])
    params = enc.init(key, x, ilens)
    out, olens, aux = enc.apply(params, x, ilens)
    assert out.shape == (2, ((37 - 1) // 2 - 1) // 2, D)
    np.testing.assert_array_equal(np.asarray(olens), [8, 5])
    # learned_ave merge produced per-layer weights
    assert len(aux["branch_weights"]) == 2
    w = aux["branch_weights"][0][1]
    np.testing.assert_allclose(
        np.asarray(w["weight_global"] + w["weight_local"]), 1.0, atol=1e-5
    )


def test_branchformer_merge_methods():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 21, 20))
    ilens = jnp.array([21, 15])
    for mm in ("concat", "fixed_ave"):
        enc = small_branchformer(merge_method=mm)
        params = enc.init(key, x, ilens)
        out, olens, _ = enc.apply(params, x, ilens)
        assert out.shape[-1] == D


def test_branchformer_interctc():
    key = jax.random.PRNGKey(2)
    enc = small_branchformer(
        interctc_layer_idx=(1,), interctc_use_conditioning=True, vocab_size=V
    )
    ctc = CTCHead(V)
    x = jax.random.normal(key, (2, 21, 20))
    ilens = jnp.array([21, 15])

    import flax.linen as nn

    class Wrap(nn.Module):
        def setup(self):
            self.enc = enc
            self.ctc = ctc

        def __call__(self, x, ilens):
            return self.enc(x, ilens, ctc=self.ctc)

    m = Wrap()
    params = m.init(key, x, ilens)
    out, olens, aux = m.apply(params, x, ilens)
    assert len(aux["intermediate_outs"]) == 1
    assert aux["intermediate_outs"][0][0] == 1


def test_visual_frontend():
    key = jax.random.PRNGKey(3)
    fe = Conv3dResNet18()
    video = jax.random.normal(key, (2, 5, 48, 48))
    lens = jnp.array([5, 3])
    variables = fe.init(key, video, lens)
    out, olens = fe.apply(variables, video, lens)
    assert out.shape == (2, 5, 512)
    np.testing.assert_array_equal(np.asarray(olens), [5, 3])
    # train mode updates batch stats
    out2, _ = fe.apply(
        variables, video, lens, train=True, mutable=["batch_stats"]
    )[0]
    assert out2.shape == (2, 5, 512)


def test_fusion_learned_ave():
    key = jax.random.PRNGKey(4)
    fu = AdaptiveAudioVisualFusion(output_size=D, hidden_units=48)
    a = jax.random.normal(key, (2, 9, D))
    v = jax.random.normal(key, (2, 9, D))
    am = jnp.arange(9)[None, :] < jnp.array([9, 5])[:, None]
    vm = jnp.arange(9)[None, :] < jnp.array([7, 9])[:, None]
    params = fu.init(key, a, am, v, vm)
    av, av_mask, aux = fu.apply(params, a, am, v, vm)
    assert av.shape == (2, 9, D)
    np.testing.assert_array_equal(
        np.asarray(jnp.sum(av_mask, -1)), [9, 9]
    )  # OR of masks
    np.testing.assert_allclose(
        np.asarray(aux["acoustic_weight"] + aux["visual_weight"]), 1.0, atol=1e-5
    )


def make_tailored(num_blocks=2):
    return TailoredEncoder(
        output_size=D,
        attention_heads=4,
        linear_units=48,
        cgmlp_linear_units=48,
        cgmlp_conv_kernel=7,
        num_blocks=num_blocks,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        attention_dropout_rate=0.0,
        acoustic_use_attn=(True, False),
        visual_use_attn=(False, True),
    )


def test_tailored_encoder():
    key = jax.random.PRNGKey(5)
    enc = make_tailored()
    from tailored_avsr_tpu.ops.posenc import RelPositionalEncoding

    a = jax.random.normal(key, (2, 9, D))
    v = jax.random.normal(key, (2, 9, D))
    pos = RelPositionalEncoding(0.0)
    pv = pos.init(key, a)
    a_, apos = pos.apply(pv, a)
    v_, vpos = pos.apply(pv, v)
    am = jnp.arange(9)[None, :] < jnp.array([9, 5])[:, None]
    vm = jnp.arange(9)[None, :] < jnp.array([9, 5])[:, None]
    params = enc.init(key, a_, apos, am, v_, vpos, vm)
    ao, am2, vo, vm2, aux = enc.apply(params, a_, apos, am, v_, vpos, vm)
    assert ao.shape == (2, 9, D) and vo.shape == (2, 9, D)
    # parameter sharing: macaron/ffn params exist once per layer (shared)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    assert any("layer_0" in n and "feed_forward_macaron" in n for n in names)


def build_asr_model(ctc_weight=0.3, input_layer="conv2d", frontend=None, decoder="transformer"):
    enc = small_branchformer(input_layer=input_layer)
    dec = None
    if ctc_weight < 1.0:
        cls = {"transformer": TransformerDecoder, "sim_t": SimTDecoder}[decoder]
        dec = cls(
            vocab_size=V,
            encoder_output_size=D,
            attention_heads=4,
            linear_units=48,
            num_blocks=2,
            dropout_rate=0.0,
            positional_dropout_rate=0.0,
        )
    return ASRModel(
        vocab_size=V,
        encoder=enc,
        ctc=CTCHead(V),
        decoder=dec,
        frontend=frontend,
        ctc_weight=ctc_weight,
        lsm_weight=0.1,
    )


def test_asr_model_hybrid_loss():
    key = jax.random.PRNGKey(6)
    model = build_asr_model()
    feats = jax.random.normal(key, (2, 45, 20))
    flens = jnp.array([45, 30])
    text = jnp.array([[1, 2, 3, -1], [4, 5, -1, -1]])
    tlens = jnp.array([3, 2])
    params = model.init(key, feats, flens, text, tlens)
    loss, stats = model.apply(params, feats, flens, text, tlens)
    assert np.isfinite(float(loss))
    assert "loss_ctc" in stats and "loss_att" in stats and "acc" in stats
    want = 0.3 * float(stats["loss_ctc"]) + 0.7 * float(stats["loss_att"])
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)
    # jitted apply works
    jloss, _ = jax.jit(lambda p, *a: model.apply(p, *a))(params, feats, flens, text, tlens)
    np.testing.assert_allclose(float(jloss), float(loss), rtol=1e-3)


def test_asr_model_ctc_only_and_greedy():
    key = jax.random.PRNGKey(7)
    model = build_asr_model(ctc_weight=1.0)
    feats = jax.random.normal(key, (2, 45, 20))
    flens = jnp.array([45, 30])
    text = jnp.array([[1, 2, 3, -1], [4, 5, -1, -1]])
    tlens = jnp.array([3, 2])
    params = model.init(key, feats, flens, text, tlens)
    loss, stats = model.apply(params, feats, flens, text, tlens)
    assert np.isfinite(float(loss)) and "loss_att" not in stats
    ids, lens = model.apply(params, feats, flens, method="ctc_greedy")
    assert ids.shape[0] == 2 and ids.shape[1] == ((45 - 1) // 2 - 1) // 2


def test_asr_model_train_mode_rngs():
    key = jax.random.PRNGKey(8)
    model = build_asr_model()
    feats = jax.random.normal(key, (2, 45, 20))
    flens = jnp.array([45, 30])
    text = jnp.array([[1, 2, 3, -1], [4, 5, -1, -1]])
    tlens = jnp.array([3, 2])
    params = model.init(key, feats, flens, text, tlens)
    loss, _ = model.apply(
        params, feats, flens, text, tlens,
        deterministic=False,
        rngs={"dropout": key, "skip": key, "specaug": key},
    )
    assert np.isfinite(float(loss))


def test_sim_t_decoder_param_sharing():
    key = jax.random.PRNGKey(9)
    model = build_asr_model(decoder="sim_t")
    feats = jax.random.normal(key, (2, 45, 20))
    flens = jnp.array([45, 30])
    text = jnp.array([[1, 2, 3, -1], [4, 5, -1, -1]])
    tlens = jnp.array([3, 2])
    params = model.init(key, feats, flens, text, tlens)
    loss, _ = model.apply(params, feats, flens, text, tlens)
    assert np.isfinite(float(loss))
    # Sim-T layer must have exactly one attention block (mha_attn), no src_attn
    dec_params = params["params"]["decoder"]["layer_0"]
    assert "mha_attn" in dec_params and "src_attn" not in dec_params


def build_avsr_model(encoder="tailored", interctc=False):
    if encoder == "tailored":
        enc = TailoredEncoder(
            output_size=D,
            attention_heads=4,
            linear_units=48,
            cgmlp_linear_units=48,
            cgmlp_conv_kernel=7,
            num_blocks=2,
            dropout_rate=0.0,
            positional_dropout_rate=0.0,
            attention_dropout_rate=0.0,
            acoustic_use_attn=(True, False),
            visual_use_attn=(False, True),
            interctc_layer_idx=(1,) if interctc else (),
            interctc_use_conditioning=interctc,
        )
    else:
        enc = ConventionalEncoder(
            output_size=D,
            attention_heads=4,
            linear_units=48,
            cgmlp_linear_units=48,
            cgmlp_conv_kernel=7,
            num_blocks=2,
            dropout_rate=0.0,
            attention_dropout_rate=0.0,
        )
    dec = TransformerDecoder(
        vocab_size=V, encoder_output_size=D, attention_heads=4,
        linear_units=48, num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
    )
    return AVSRModel(
        vocab_size=V,
        encoder=enc,
        audiovisual_fusion=AdaptiveAudioVisualFusion(output_size=D, hidden_units=48),
        ctc=CTCHead(V),
        acoustic_embed=DefaultEmbeddingLayerForAVSR(
            output_size=D, input_layer="conv2d", dropout_rate=0.0, positional_dropout_rate=0.0
        ),
        visual_embed=DefaultEmbeddingLayerForAVSR(
            output_size=D, input_layer="linear", dropout_rate=0.0, positional_dropout_rate=0.0
        ),
        decoder=dec,
        ctc_weight=0.1,
        interctc_weight=0.5 if interctc else 0.0,
        lsm_weight=0.1,
    )


def avsr_batch(key):
    # audio: fbank-like feats (frontend=None in this test); video: 512-d feats
    a = jax.random.normal(key, (2, 37, 20))
    alens = jnp.array([37, 21])
    v = jax.random.normal(key, (2, 8, 512))
    vlens = jnp.array([8, 5])
    text = jnp.array([[1, 2, 3, -1], [4, 5, -1, -1]])
    tlens = jnp.array([3, 2])
    return a, alens, v, vlens, text, tlens


@pytest.mark.parametrize("encoder", ["tailored", "conventional"])
def test_avsr_model(encoder):
    key = jax.random.PRNGKey(10)
    model = build_avsr_model(encoder)
    batch = avsr_batch(key)
    params = model.init(key, *batch)
    loss, stats = model.apply(params, *batch)
    assert np.isfinite(float(loss))
    assert "fusion_weights" in stats
    # audio x4-subsampled to 8 frames == video length -> aligned


def test_avsr_interctc():
    key = jax.random.PRNGKey(11)
    model = build_avsr_model("tailored", interctc=True)
    batch = avsr_batch(key)
    params = model.init(key, *batch)
    loss, stats = model.apply(params, *batch)
    assert np.isfinite(float(loss))
    assert "loss_interctc_layer1" in stats


def test_avsr_audiovisual_interctc_conditioning():
    """audiovisual_interctc_conditioning=True conditions BOTH streams on the
    fused intermediate CTC posterior (ref tailored/encoder.py:296-318)."""
    key = jax.random.PRNGKey(21)
    enc = TailoredEncoder(
        output_size=D, attention_heads=4, linear_units=48,
        cgmlp_linear_units=48, cgmlp_conv_kernel=7, num_blocks=2,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        acoustic_use_attn=(True, False), visual_use_attn=(False, True),
        interctc_layer_idx=(1,), interctc_use_conditioning=True,
        audiovisual_interctc_conditioning=True,
    )
    dec = TransformerDecoder(
        vocab_size=V, encoder_output_size=D, attention_heads=4,
        linear_units=48, num_blocks=1, dropout_rate=0.0, positional_dropout_rate=0.0,
    )
    model = AVSRModel(
        vocab_size=V, encoder=enc,
        audiovisual_fusion=AdaptiveAudioVisualFusion(output_size=D, hidden_units=48),
        ctc=CTCHead(V),
        acoustic_embed=DefaultEmbeddingLayerForAVSR(
            output_size=D, input_layer="conv2d", dropout_rate=0.0,
            positional_dropout_rate=0.0,
        ),
        visual_embed=DefaultEmbeddingLayerForAVSR(
            output_size=D, input_layer="linear", dropout_rate=0.0,
            positional_dropout_rate=0.0,
        ),
        decoder=dec, ctc_weight=0.3, interctc_weight=0.5, lsm_weight=0.1,
    )
    batch = avsr_batch(key)
    params = model.init(key, *batch)
    loss, stats = model.apply(params, *batch)
    assert np.isfinite(float(loss)) and "loss_interctc_layer1" in stats


def test_maskctc_model():
    key = jax.random.PRNGKey(12)
    enc = small_branchformer(input_layer="conv2d")
    dec = MLMDecoder(
        vocab_size=V + 1, encoder_output_size=D, attention_heads=4,
        linear_units=48, num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
    )
    model = MaskCTCModel(
        vocab_size=V, encoder=enc, ctc=CTCHead(V), decoder=dec,
        ctc_weight=0.3, lsm_weight=0.1,
    )
    feats = jax.random.normal(key, (2, 45, 20))
    flens = jnp.array([45, 30])
    text = jnp.array([[1, 2, 3, -1], [4, 5, -1, -1]])
    tlens = jnp.array([3, 2])
    params = model.init({"params": key, "mlm": key}, feats, flens, text, tlens)
    loss, stats = model.apply(
        params, feats, flens, text, tlens,
        deterministic=False,
        rngs={"dropout": key, "skip": key, "specaug": key, "mlm": key},
    )
    assert np.isfinite(float(loss))


def test_transformer_lm():
    key = jax.random.PRNGKey(13)
    lm = TransformerLM(vocab_size=V, att_unit=D, head=4, unit=48, layer=2,
                       dropout_rate=0.0, positional_dropout_rate=0.0)
    toks = jnp.array([[1, 2, 3, -1], [4, 5, 6, 7]])
    lens = jnp.array([3, 4])
    params = lm.init(key, toks, lens)
    logits = lm.apply(params, toks, lens)
    assert logits.shape == (2, 4, V)
    nll, counts = lm.apply(params, toks, lens, method="nll")
    assert nll.shape == (2,)
    np.testing.assert_array_equal(np.asarray(counts), [4, 5])
    # score_step consistency: step log-probs match full forward
    ys = jnp.array([[V - 1, 1, 2, 0], [V - 1, 4, 5, 0]])
    logp = lm.apply(params, ys, jnp.array(3), method="score_step")
    assert logp.shape == (2, V)
    np.testing.assert_allclose(np.asarray(jnp.exp(logp).sum(-1)), 1.0, rtol=1e-5)


def test_decoder_score_step_matches_forward():
    key = jax.random.PRNGKey(14)
    dec = TransformerDecoder(
        vocab_size=V, encoder_output_size=D, attention_heads=4,
        linear_units=48, num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
    )
    mem = jax.random.normal(key, (2, 7, D))
    mem_mask = jnp.ones((2, 7), bool)
    ys = jnp.array([[V - 1, 1, 2, 0], [V - 1, 3, 4, 0]])
    params = dec.init(key, mem, mem_mask, ys, jnp.array([4, 4]))
    # full forward on prefix of length 3; logits at position 2 predict token 3
    logits = dec.apply(params, mem, mem_mask, ys, jnp.array([3, 3]))
    full_lp = jax.nn.log_softmax(logits[:, 2].astype(jnp.float32), -1)
    step_lp = dec.apply(params, mem, mem_mask, ys, jnp.array(3), method="score_step")
    np.testing.assert_allclose(np.asarray(step_lp), np.asarray(full_lp), atol=1e-5)


# ---------------------------------------------------------------------------
# decoder registry breadth: lightweight/dynamic conv + RNN attention decoder
# (reference choices at src/tasks/asr.py:176-194)
# ---------------------------------------------------------------------------
from tailored_avsr_tpu.tasks.common import build_decoder  # noqa: E402


@pytest.mark.parametrize(
    "name,conf",
    [
        ("lightweight_conv", {"kernel_size": 3}),
        ("dynamic_conv", {"kernel_size": 3}),
        ("lightweight_conv2d", {"kernel_size": 3}),
        ("dynamic_conv2d", {"kernel_size": 3, "conv_usebias": True}),
        ("rnn", {"hidden_size": 16, "num_layers": 2, "att_dim": 12,
                 "aconv_chans": 4, "aconv_filts": 3}),
        ("s4", {"d_state": 8}),
    ],
)
def test_registry_decoders(name, conf):
    key = jax.random.PRNGKey(7)
    B, T, D2, V2, L = 2, 9, 16, 11, 6
    mem = jax.random.normal(key, (B, T, D2))
    mmask = jnp.arange(T)[None, :] < jnp.array([T, 5])[:, None]
    ys = jnp.array([[9, 2, 3, 4, 10, 10], [9, 5, 6, 10, 10, 10]], jnp.int32)
    ylen = jnp.array([5, 4])
    conf = dict(conf, num_blocks=2, attention_heads=4, linear_units=24,
                dropout_rate=0.0)
    dec = build_decoder(name, conf, V2, D2)
    params = dec.init(key, mem, mmask, ys, ylen)
    out = dec.apply(params, mem, mmask, ys, ylen)
    assert out.shape == (B, L, V2)
    lp = dec.apply(params, mem, mmask, ys, jnp.asarray(3), method="score_step")
    assert np.allclose(np.exp(np.asarray(lp)).sum(-1), 1, atol=1e-4)
    # causality: a future token must not change the score at pos
    lp2 = dec.apply(
        params, mem, mmask, ys.at[:, 4].set(2), jnp.asarray(3), method="score_step"
    )
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), atol=1e-5)


def test_gated_decoders():
    for name in ("whisper", "hugging_face_transformers"):
        with pytest.raises(NotImplementedError):
            build_decoder(name, {}, 11, 16)


def test_lightconv2d_matches_bruteforce():
    """The vectorized 2D (time x feature) conv equals the nested-loop
    definition: causal in time, 'same'-padded in feature, softmax-normalized
    kernel shared across wshare channel groups."""
    from tailored_avsr_tpu.models.decoder import ConvDecoderLayer

    key = jax.random.PRNGKey(3)
    B, T, D2, K, W = 2, 6, 8, 3, 2
    layer = ConvDecoderLayer(size=D2, kernel_size=K, two_dim=True, wshare=W,
                             dropout_rate=0.0)
    h = jax.random.normal(key, (B, T, D2))
    mem = jax.random.normal(key, (B, 4, D2))
    params = layer.init(key, h, None, mem, jnp.ones((B, 4), bool))
    y = layer.apply(params, h, True, method="_conv")

    p = params["params"]
    x = h @ p["glu_proj"]["kernel"] + p["glu_proj"]["bias"]
    x = np.asarray(x[..., :D2] * jax.nn.sigmoid(x[..., D2:]))
    w = np.asarray(jax.nn.softmax(p["conv_weight"], -1)).reshape(W, K, K)
    ref = np.zeros((B, T, D2))
    pf = K // 2
    for b in range(B):
        for t in range(T):
            for d in range(D2):
                g = d // (D2 // W)
                for i in range(K):  # time tap i reads t - (K-1) + i
                    for j in range(K):  # feature tap j reads d - pf + j
                        ti, dj = t - (K - 1) + i, d - pf + j
                        if 0 <= ti and 0 <= dj < D2:
                            ref[b, t, d] += w[g, i, j] * x[b, ti, dj]
    ref = ref @ np.asarray(p["out_proj"]["kernel"]) + np.asarray(
        p["out_proj"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_asr_model_with_rnn_decoder():
    """Hybrid CTC/attention ASR with the RNN decoder end to end (loss + beam
    scoring path via decoder_score_step)."""
    key = jax.random.PRNGKey(8)
    enc = small_branchformer(input_layer="conv2d")
    dec = build_decoder(
        "rnn", {"hidden_size": 16, "num_layers": 1, "att_dim": 12,
                "aconv_chans": 2, "aconv_filts": 3, "dropout_rate": 0.0}, V, D)
    model = ASRModel(vocab_size=V, encoder=enc, ctc=CTCHead(V), decoder=dec,
                     ctc_weight=0.3, lsm_weight=0.1)
    feats = jax.random.normal(key, (2, 45, 20))
    flens = jnp.array([45, 30])
    text = jnp.array([[1, 2, 3, -1], [4, 5, -1, -1]])
    tlens = jnp.array([3, 2])
    params = model.init(key, feats, flens, text, tlens)
    loss, stats = model.apply(params, feats, flens, text, tlens)
    assert np.isfinite(float(loss))


def test_s4d_layer_matches_explicit_recurrence():
    """The Vandermonde-kernel causal conv equals the sequential diagonal-SSM
    recurrence h_k = Abar h_{k-1} + Bbar u_k, y = 2Re(C h) + D u (S4D)."""
    import math
    from tailored_avsr_tpu.models.s4_decoder import S4DLayer

    B, T, C2, N2 = 2, 12, 8, 16
    key = jax.random.PRNGKey(3)
    u = jax.random.normal(key, (B, T, C2))
    layer = S4DLayer(d_state=N2)
    params = layer.init(key, u)
    y = np.asarray(layer.apply(params, u), np.float64)

    pr = params["params"]
    dt = np.exp(np.asarray(pr["log_dt"], np.float64))[:, None]
    a = -np.exp(np.asarray(pr["log_A_real"], np.float64)) + 1j * np.asarray(
        pr["A_imag"], np.float64)
    a_bar = np.exp(dt * a)
    b_bar = (a_bar - 1.0) / a
    cc = np.asarray(pr["C_re"], np.float64) + 1j * np.asarray(pr["C_im"], np.float64)
    d_skip = np.asarray(pr["D"], np.float64)
    un = np.asarray(u, np.float64)
    y_ref = np.zeros((B, T, C2))
    for b in range(B):
        h = np.zeros((C2, N2), complex)
        for t in range(T):
            h = a_bar * h + b_bar * un[b, t][:, None]
            y_ref[b, t] = 2 * np.real(np.sum(cc * h, -1)) + d_skip * un[b, t]
    y_ref = y_ref / (1 + np.exp(-y_ref))  # silu
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# multi-speaker PIT path (reference registers espnet's pit_espnet model +
# transformer_multispkr encoder, src/tasks/asr.py:47-49, 125-134)
# ---------------------------------------------------------------------------


def test_multispeaker_encoder_shapes():
    from tailored_avsr_tpu.tasks.common import build_encoder

    key = jax.random.PRNGKey(11)
    enc = build_encoder(
        "transformer_multispkr",
        {"output_size": D, "attention_heads": 4, "linear_units": 48,
         "num_blocks": 2, "num_blocks_sd": 1, "num_inf": 2,
         "input_layer": "conv2d", "dropout_rate": 0.0,
         "positional_dropout_rate": 0.0},
    )
    x = jax.random.normal(key, (2, 37, 20))
    ilens = jnp.array([37, 25])
    params = enc.init(key, x, ilens)
    out, olens, _ = enc.apply(params, x, ilens)
    assert out.shape[:2] == (2, 2) and out.shape[-1] == D
    assert np.isfinite(np.asarray(out)).all()
    # speaker-dependent stacks have distinct params -> branches differ
    assert not np.allclose(np.asarray(out[:, 0]), np.asarray(out[:, 1]))


def test_pit_model_permutation_invariance():
    """The PIT loss must be invariant to the order in which the reference
    transcripts arrive (that is the whole point of PIT)."""
    from tailored_avsr_tpu.models.pit_model import PITASRModel
    from tailored_avsr_tpu.tasks.common import build_encoder

    key = jax.random.PRNGKey(12)
    enc = build_encoder(
        "transformer_multispkr",
        {"output_size": D, "attention_heads": 4, "linear_units": 48,
         "num_blocks": 1, "num_blocks_sd": 1, "num_inf": 2,
         "input_layer": "conv2d", "dropout_rate": 0.0,
         "positional_dropout_rate": 0.0},
    )
    dec = TransformerDecoder(
        vocab_size=V, encoder_output_size=D, attention_heads=4,
        linear_units=48, num_blocks=1, dropout_rate=0.0,
        positional_dropout_rate=0.0,
    )
    model = PITASRModel(
        num_inf=2, num_ref=2, vocab_size=V, encoder=enc, ctc=CTCHead(V),
        decoder=dec, ctc_weight=0.3, lsm_weight=0.1,
    )
    feats = jax.random.normal(key, (2, 45, 20))
    flens = jnp.array([45, 30])
    text = jnp.array(
        [[[1, 2, 3, -1], [4, 5, -1, -1]], [[6, 7, -1, -1], [8, -1, -1, -1]]]
    )
    tlens = jnp.array([[3, 2], [2, 1]])
    params = model.init(key, feats, flens, text, tlens)
    loss1, stats = model.apply(params, feats, flens, text, tlens)
    assert np.isfinite(float(loss1))
    assert "loss_att" in stats and "loss_ctc" in stats
    # swap the speaker order of the references: loss must not change
    loss2, _ = model.apply(params, feats, flens, text[:, ::-1], tlens[:, ::-1])
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


def test_pit_model_via_task_factory():
    from argparse import Namespace

    from tailored_avsr_tpu.tasks import ASRTask

    cfg = Namespace(
        task="asr",
        tokens={"token_list_path": None, "token_type": "char"},
        frontend="none",
        encoder="transformer_multispkr",
        encoder_conf={"output_size": D, "attention_heads": 4,
                      "linear_units": 48, "num_blocks": 1, "num_blocks_sd": 1,
                      "num_inf": 2, "input_layer": "conv2d",
                      "dropout_rate": 0.0},
        decoder="transformer",
        decoder_conf={"attention_heads": 4, "linear_units": 48,
                      "num_blocks": 1},
        model="pit_espnet",
        model_conf={"ctc_weight": 0.5, "num_inf": 2, "num_ref": 2},
        input_size=20,
    )
    token_list = [f"t{i}" for i in range(V)]
    model = ASRTask.build_model(cfg, token_list)
    key = jax.random.PRNGKey(13)
    feats = jax.random.normal(key, (2, 33, 20))
    flens = jnp.array([33, 21])
    text = jnp.array(
        [[[1, 2, 3, -1], [4, 5, -1, -1]], [[6, 7, -1, -1], [8, -1, -1, -1]]]
    )
    tlens = jnp.array([[3, 2], [2, 1]])
    params = model.init(key, feats, flens, text, tlens)
    loss, _ = model.apply(params, feats, flens, text, tlens)
    assert np.isfinite(float(loss))


def test_interctc_with_zero_ctc_weight():
    """ctc_weight 0 + interCTC taps: the interCTC term stands alone and is
    mixed into the final loss by interctc_weight (previously a None deref)."""
    enc = small_branchformer(interctc_layer_idx=(1,), vocab_size=V)
    dec = TransformerDecoder(
        vocab_size=V, encoder_output_size=D, attention_heads=4,
        linear_units=48, num_blocks=1, dropout_rate=0.0,
        positional_dropout_rate=0.0,
    )
    model = ASRModel(vocab_size=V, encoder=enc, ctc=CTCHead(V), decoder=dec,
                     ctc_weight=0.0, interctc_weight=0.3, lsm_weight=0.0)
    key = jax.random.PRNGKey(21)
    feats = jax.random.normal(key, (2, 45, 20))
    flens = jnp.array([45, 30])
    text = jnp.array([[1, 2, 3, -1], [4, 5, -1, -1]])
    tlens = jnp.array([3, 2])
    params = model.init(key, feats, flens, text, tlens)
    loss, stats = model.apply(params, feats, flens, text, tlens)
    assert np.isfinite(float(loss))
    assert "loss_interctc_layer1" in stats and "loss_att" in stats
    want = 0.7 * float(stats["loss_att"]) + 0.3 * float(
        stats["loss_interctc_layer1"]
    )
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
