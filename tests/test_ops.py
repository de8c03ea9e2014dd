"""Unit tests for the ops library: shapes, masking contracts, and numerics
(reference contracts documented in SURVEY.md §2.3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tailored_avsr_tpu.ops import (
    make_valid_mask,
    mask_lengths,
    PositionwiseFeedForward,
    AbsolutePositionalEncoding,
    RelPositionalEncoding,
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
    FastSelfAttention,
    ConvolutionalGatingMLP,
    Conv2dSubsampling,
    subsampled_length,
    LogMelFrontend,
    SpecAug,
    UtteranceMVN,
    label_smoothing_loss,
    token_accuracy,
    add_sos_eos,
    ctc_loss,
)
from tailored_avsr_tpu.ops.attention import rel_shift
from tailored_avsr_tpu.ops.posenc import rel_pos_table


def test_masking():
    lengths = jnp.array([3, 5])
    m = make_valid_mask(lengths, 6)
    assert m.shape == (2, 6)
    np.testing.assert_array_equal(np.asarray(mask_lengths(m)), [3, 5])
    assert bool(m[0, 2]) and not bool(m[0, 3])


def test_rel_shift_semantics():
    b, h, t = 1, 1, 4
    x = jnp.arange(2 * t - 1, dtype=jnp.float32)[None, None, None, :].repeat(t, axis=2)
    out = rel_shift(x)
    # out[i, j] must read index (t-1) - i + j -> relative distance i-j
    for i in range(t):
        for j in range(t):
            assert out[0, 0, i, j] == (t - 1) - i + j


def test_legacy_rel_shift_semantics():
    """Legacy shift: out[i, j] = x[i, t-1-(i-j)] wherever j <= i (the only
    entries the legacy formulation defines; its pos table has no negative
    distances)."""
    from tailored_avsr_tpu.ops.attention import legacy_rel_shift

    b, h, t = 1, 1, 5
    x = jnp.arange(t * t, dtype=jnp.float32).reshape(1, 1, t, t)
    out = legacy_rel_shift(x)
    for i in range(t):
        for j in range(i + 1):
            assert out[0, 0, i, j] == x[0, 0, i, t - 1 - (i - j)]


def test_legacy_relpos_attention():
    """legacy=True consumes the (1, T, D) LegacyRelPositionalEncoding table and
    still respects key masking."""
    from tailored_avsr_tpu.ops.posenc import LegacyRelPositionalEncoding

    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 6, 16))
    pos = LegacyRelPositionalEncoding(dropout_rate=0.0)
    pvars = pos.init(key, x)
    xs, pos_emb = pos.apply(pvars, x)
    assert pos_emb.shape == (1, 6, 16)
    mask = make_valid_mask(jnp.array([4, 6]), 6)
    mha = RelPositionMultiHeadedAttention(num_heads=4, legacy=True)
    params = mha.init(key, xs, xs, xs, pos_emb, mask)
    out = mha.apply(params, xs, xs, xs, pos_emb, mask)
    assert out.shape == x.shape
    x2 = xs.at[0, 4:].set(50.0)
    out2 = mha.apply(params, x2, x2, x2, pos_emb, mask)
    np.testing.assert_allclose(out[0, :4], out2[0, :4], atol=1e-4)


def test_rel_pos_table_layout():
    t, d = 5, 8
    tab = rel_pos_table(t, d)
    assert tab.shape == (2 * t - 1, d)
    # center row is position 0 -> sin terms zero, cos terms one
    np.testing.assert_allclose(tab[t - 1, 0::2], 0.0, atol=1e-6)
    np.testing.assert_allclose(tab[t - 1, 1::2], 1.0, atol=1e-6)


def test_attention_masked_positions_ignored():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 6, 16))
    mask = make_valid_mask(jnp.array([4, 6]), 6)
    mha = MultiHeadedAttention(num_heads=4, model_dim=16)
    params = mha.init(key, x, x, x, mask)
    out1 = mha.apply(params, x, x, x, mask)
    # perturb padded frames: valid outputs must not change
    x2 = x.at[0, 4:].set(100.0)
    out2 = mha.apply(params, x2, x2, x2, mask)
    np.testing.assert_allclose(out1[0, :4], out2[0, :4], atol=1e-5)
    assert out1.shape == x.shape


def test_relpos_attention_shapes_and_masking():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 6, 16))
    pos = RelPositionalEncoding(dropout_rate=0.0)
    pvars = pos.init(key, x)
    xs, pos_emb = pos.apply(pvars, x)
    assert pos_emb.shape == (1, 11, 16)
    mask = make_valid_mask(jnp.array([4, 6]), 6)
    mha = RelPositionMultiHeadedAttention(num_heads=4)
    params = mha.init(key, xs, xs, xs, pos_emb, mask)
    out = mha.apply(params, xs, xs, xs, pos_emb, mask)
    assert out.shape == x.shape
    x2 = xs.at[0, 4:].set(50.0)
    out2 = mha.apply(params, x2, x2, x2, pos_emb, mask)
    np.testing.assert_allclose(out[0, :4], out2[0, :4], atol=1e-4)


def test_fast_selfattention():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 5, 16))
    mask = make_valid_mask(jnp.array([3, 5]), 5)
    m = FastSelfAttention(num_heads=4)
    params = m.init(key, x, mask)
    out = m.apply(params, x, mask)
    assert out.shape == x.shape


def test_cgmlp():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 7, 16))
    m = ConvolutionalGatingMLP(linear_units=32, kernel_size=5)
    params = m.init(key, x)
    out = m.apply(params, x)
    assert out.shape == x.shape


def test_conv2d_subsampling_lengths():
    key = jax.random.PRNGKey(4)
    for factor in (1, 2, 4, 6, 8):
        t = 37
        x = jax.random.normal(key, (2, t, 80))
        m = Conv2dSubsampling(output_size=16, factor=factor)
        params = m.init(key, x)
        out = m.apply(params, x)
        assert out.shape[1] == subsampled_length(t, factor), factor
        assert out.shape[2] == 16
    # reference x4 formula: ((T-1)//2 - 1)//2
    assert subsampled_length(100, 4) == ((100 - 1) // 2 - 1) // 2


def test_logmel_frontend_matches_torch_stft():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 3200).astype(np.float32)
    lengths = jnp.array([3200, 2000])
    fe = LogMelFrontend()
    params = fe.init(jax.random.PRNGKey(0), jnp.asarray(wav), lengths)
    feats, olens = fe.apply(params, jnp.asarray(wav), lengths)
    assert feats.shape == (2, 3200 // 160 + 1, 80)
    np.testing.assert_array_equal(np.asarray(olens), [21, 13])
    # cross-check power spectrum against torch.stft (the reference's frontend core)
    spec = torch.stft(
        torch.from_numpy(wav),
        n_fft=512,
        hop_length=160,
        win_length=400,
        window=torch.hann_window(400),
        center=True,
        return_complex=True,
    )
    ref_power = (spec.abs() ** 2).transpose(1, 2).numpy()  # (B, T', F)
    from tailored_avsr_tpu.ops.frontend_audio import stft_frames, hann_window

    frames = stft_frames(jnp.asarray(wav), 512, 160)
    win = np.pad(hann_window(400), (56, 56))
    spec_j = jnp.fft.rfft(frames * win[None, None], n=512, axis=-1)
    power_j = np.asarray(jnp.abs(spec_j) ** 2)
    assert power_j.shape == ref_power.shape
    np.testing.assert_allclose(power_j, ref_power, rtol=1e-3, atol=1e-3)


def test_specaug_masks_and_shapes():
    key = jax.random.PRNGKey(5)
    x = jnp.ones((2, 50, 80))
    lengths = jnp.array([50, 30])
    sa = SpecAug()
    variables = sa.init({"params": key, "specaug": key}, x, lengths)
    out, olens = sa.apply(variables, x, lengths, rngs={"specaug": key})
    assert out.shape == x.shape
    assert float(jnp.sum(out == 0.0)) > 0  # something got masked
    # deterministic mode = identity
    out2, _ = sa.apply(variables, x, lengths, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(x))


def test_utterance_mvn():
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (2, 10, 4)) + 5.0
    lengths = jnp.array([10, 6])
    mvn = UtteranceMVN()
    out, _ = mvn.apply(mvn.init(key, x, lengths), x, lengths)
    np.testing.assert_allclose(np.asarray(jnp.mean(out[0], axis=0)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.mean(out[1, :6], axis=0)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1, 6:]), 0.0, atol=1e-7)  # padding zeroed


def test_add_sos_eos():
    text = jnp.array([[1, 2, 3, -1], [4, -1, -1, -1]])
    ys_in, ys_out = add_sos_eos(text, sos=9, eos=9, ignore_id=-1)
    np.testing.assert_array_equal(np.asarray(ys_in), [[9, 1, 2, 3, 9], [9, 4, 9, 9, 9]])
    np.testing.assert_array_equal(
        np.asarray(ys_out), [[1, 2, 3, 9, -1], [4, 9, -1, -1, -1]]
    )


def test_label_smoothing_matches_torch_kldiv():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 3, 5).astype(np.float32)
    targets = np.array([[1, 2, -1], [3, -1, -1]])
    got = float(label_smoothing_loss(jnp.asarray(logits), jnp.asarray(targets), 0.1))
    # torch reference implementation (espnet LabelSmoothingLoss semantics)
    t_logits = torch.from_numpy(logits).view(-1, 5)
    t_tgt = torch.from_numpy(targets).view(-1)
    conf, low = 0.9, 0.1 / 4
    true = torch.full((6, 5), low)
    ignore = t_tgt == -1
    tgt_clamped = t_tgt.masked_fill(ignore, 0)
    true.scatter_(1, tgt_clamped.unsqueeze(1), conf)
    kl = torch.nn.functional.kl_div(
        torch.log_softmax(t_logits, dim=-1), true, reduction="none"
    )
    want = float(kl.masked_fill(ignore.unsqueeze(1), 0).sum() / 2)
    assert abs(got - want) < 1e-4


def test_ctc_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    b, t, v, l = 2, 12, 6, 4
    logits = rng.randn(b, t, v).astype(np.float32)
    labels = np.array([[1, 2, 3, 4], [2, 3, -1, -1]])
    llens = np.array([12, 9])
    tlens = np.array([4, 2])
    got = float(
        ctc_loss(jnp.asarray(logits), jnp.asarray(llens), jnp.asarray(labels), jnp.asarray(tlens))
    )
    logp = torch.from_numpy(logits).log_softmax(-1).transpose(0, 1)
    tgt = torch.tensor([1, 2, 3, 4, 2, 3])
    ref = torch.nn.functional.ctc_loss(
        logp, tgt, torch.tensor(llens), torch.tensor(tlens),
        blank=0, reduction="sum", zero_infinity=True,
    ) / b
    assert abs(got - float(ref)) < 1e-3


def test_ctc_loss_zero_infinity():
    """Infeasible alignments (label longer than frames) contribute 0 loss,
    matching torch CTCLoss zero_infinity (ref src/ctc/ctc.py:40-43)."""
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, 4, 6).astype(np.float32))
    labels = jnp.array([[1, 2, 3, 4, 5], [1, 2, -1, -1, -1]])
    llens = jnp.array([4, 4])
    tlens = jnp.array([5, 2])  # first: 5 labels > 4 frames -> infeasible
    loss_both = float(ctc_loss(logits, llens, labels, tlens))
    loss_only2 = float(
        ctc_loss(logits[1:], llens[1:], labels[1:], tlens[1:])
    )
    np.testing.assert_allclose(loss_both, loss_only2 / 2, rtol=1e-5)
    # repeats also consume frames: [1,1,2,2] needs >= 6 frames
    labels_r = jnp.array([[1, 1, 2, 2, -1]])
    loss_r = float(ctc_loss(logits[:1], jnp.array([4]), labels_r, jnp.array([4])))
    assert loss_r == 0.0


def test_token_accuracy():
    logits = jnp.asarray(np.eye(4)[[1, 2, 3]][None])  # predicts 1,2,3
    targets = jnp.array([[1, 2, -1]])
    assert float(token_accuracy(logits, targets)) == 1.0


def test_ffn_and_posenc_shapes():
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (2, 5, 16))
    ffn = PositionwiseFeedForward(hidden_units=32, activation="swish")
    out = ffn.apply(ffn.init(key, x), x)
    assert out.shape == x.shape
    pe = AbsolutePositionalEncoding(dropout_rate=0.0)
    out = pe.apply(pe.init(key, x), x)
    assert out.shape == x.shape
