"""Torch-twin golden numerics: minimal PyTorch reimplementations (written
from the SURVEY.md contracts, NOT imported from espnet) of the core op chain,
checked for fp32 agreement with the flax ops after weight translation through
``utils/torch_compat`` layout rules (torch weights -> flax -> same outputs).

Covers the numerics the reference checkpoints depend on (VERDICT round-1
item 3): rel-pos MHA with u/v biases + rel-shift
(ref src/encoder/branchformer/encoder_layer.py:221-259 semantics), the cgMLP
gate (espnet ConvolutionalGatingMLP), the ResNet BasicBlock with BN running
stats (ref src/frontend/conv3d_resnet18/modules/resnet.py:44-106), and the
STFT->log-mel chain (espnet DefaultFrontend: torch.stft center/reflect +
Slaney mel + clamp(1e-10).log()).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tailored_avsr_tpu.utils.torch_compat import _to_flax  # noqa: E402

from tests.torch_twins import (  # noqa: E402
    TorchBasicBlock,
    TorchCgMLP,
    TorchRelPosMHA,
)

torch.manual_seed(0)


def t2f(tensor, leaf="kernel"):
    """torch tensor -> flax layout via the production translation rule."""
    v = tensor.detach().numpy()
    if leaf == "kernel":
        if v.ndim == 2:
            shape = (v.shape[1], v.shape[0])
        elif v.ndim == 3:
            shape = (v.shape[2], v.shape[1], v.shape[0])
        elif v.ndim == 4:
            shape = (v.shape[2], v.shape[3], v.shape[1], v.shape[0])
        else:
            shape = v.shape
    else:
        shape = v.shape
    return _to_flax(v, shape, leaf)


# ---------------------------------------------------------------------------
# rel-pos MHA with u/v biases + latest rel-shift
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_mask", [False, True])
def test_relpos_mha_matches_torch(use_mask):
    from tailored_avsr_tpu.ops.attention import RelPositionMultiHeadedAttention
    from tailored_avsr_tpu.ops.posenc import RelPositionalEncoding

    d, h, b, t = 32, 4, 2, 9
    tw = TorchRelPosMHA(d, h).eval()

    params = {}
    for name in ("linear_q", "linear_k", "linear_v", "linear_out"):
        lin = getattr(tw, name)
        params[name] = {
            "kernel": t2f(lin.weight), "bias": t2f(lin.bias, "bias")
        }
    params["linear_pos"] = {"kernel": t2f(tw.linear_pos.weight)}
    params["pos_bias_u"] = t2f(tw.pos_bias_u, "pos_bias_u")
    params["pos_bias_v"] = t2f(tw.pos_bias_v, "pos_bias_v")

    x = np.random.RandomState(1).randn(b, t, d).astype(np.float32)
    # pos table from the production encoding (both sides consume the same)
    pe = RelPositionalEncoding(dropout_rate=0.0)
    _, pos = pe.apply({}, jnp.asarray(x))
    mask = None
    if use_mask:
        mask = np.ones((b, t), bool)
        mask[1, 6:] = False

    mha = RelPositionMultiHeadedAttention(num_heads=h, dropout_rate=0.0)
    got = mha.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
        pos, None if mask is None else jnp.asarray(mask),
    )
    with torch.no_grad():
        want = tw(
            torch.from_numpy(x), torch.from_numpy(np.asarray(pos)),
            None if mask is None else torch.from_numpy(mask),
        )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------------------
# cgMLP (channel_proj1 + GELU -> CSGU -> channel_proj2)
# ---------------------------------------------------------------------------


def test_cgmlp_matches_torch():
    from tailored_avsr_tpu.ops.cgmlp import ConvolutionalGatingMLP

    d, units, kernel, b, t = 16, 48, 7, 2, 11
    tw = TorchCgMLP(d, units, kernel).eval()
    params = {
        "channel_proj1": {
            "kernel": t2f(tw.channel_proj1[0].weight),
            "bias": t2f(tw.channel_proj1[0].bias, "bias"),
        },
        "csgu": {
            "norm": {
                "scale": t2f(tw.csgu.norm.weight, "scale"),
                "bias": t2f(tw.csgu.norm.bias, "bias"),
            },
            "conv": {
                "kernel": t2f(tw.csgu.conv.weight),
                "bias": t2f(tw.csgu.conv.bias, "bias"),
            },
        },
        "channel_proj2": {
            "kernel": t2f(tw.channel_proj2.weight),
            "bias": t2f(tw.channel_proj2.bias, "bias"),
        },
    }
    x = np.random.RandomState(2).randn(b, t, d).astype(np.float32)
    mlp = ConvolutionalGatingMLP(linear_units=units, kernel_size=kernel)
    got = mlp.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want = tw(torch.from_numpy(x))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=5e-5
    )


# ---------------------------------------------------------------------------
# ResNet BasicBlock with BN running stats (eval mode)
# ---------------------------------------------------------------------------


def _randomize_bn(bn, rng):
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.rand(bn.num_features).astype(np.float32) + 0.5))
        bn.bias.copy_(torch.from_numpy(rng.randn(bn.num_features).astype(np.float32) * 0.1))
        bn.running_mean.copy_(torch.from_numpy(rng.randn(bn.num_features).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(rng.rand(bn.num_features).astype(np.float32) + 0.2))


def _bn_trees(bn):
    return (
        {"scale": t2f(bn.weight, "scale"), "bias": t2f(bn.bias, "bias")},
        {"mean": t2f(bn.running_mean, "mean"), "var": t2f(bn.running_var, "var")},
    )


@pytest.mark.parametrize("stride", [1, 2])
def test_resnet_basicblock_matches_torch(stride):
    from tailored_avsr_tpu.models.frontends import BasicBlock

    inplanes, planes, b, hw = 8, 8 if stride == 1 else 16, 2, 12
    rng = np.random.RandomState(3)
    tw = TorchBasicBlock(inplanes, planes, stride).eval()
    _randomize_bn(tw.bn1, rng)
    _randomize_bn(tw.bn2, rng)
    params = {
        "conv1": {"kernel": t2f(tw.conv1.weight)},
        "conv2": {"kernel": t2f(tw.conv2.weight)},
    }
    stats = {}
    params["bn1"], stats["bn1"] = _bn_trees(tw.bn1)
    params["bn2"], stats["bn2"] = _bn_trees(tw.bn2)
    if tw.downsample is not None:
        _randomize_bn(tw.downsample[1], rng)
        params["downsample_conv"] = {"kernel": t2f(tw.downsample[0].weight)}
        params["downsample_bn"], stats["downsample_bn"] = _bn_trees(tw.downsample[1])

    x = rng.randn(b, inplanes, hw, hw).astype(np.float32)
    blk = BasicBlock(planes=planes, stride=stride, activation_type="swish")
    # flax is NHWC; torch is NCHW
    got = blk.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    with torch.no_grad():
        want = tw(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# STFT -> power -> log-mel chain (espnet DefaultFrontend numerics)
# ---------------------------------------------------------------------------


def test_logmel_frontend_matches_torch_stft():
    from tailored_avsr_tpu.ops.frontend_audio import LogMelFrontend, mel_filterbank

    n_fft, win, hop, n_mels, sr = 512, 400, 160, 80, 16000
    b, s = 2, 16000
    rng = np.random.RandomState(4)
    x = (rng.randn(b, s) * 0.1).astype(np.float32)

    fe = LogMelFrontend(
        fs=sr, n_fft=n_fft, win_length=win, hop_length=hop, n_mels=n_mels
    )
    got, got_lens = fe.apply(
        {}, jnp.asarray(x), jnp.full((b,), s, jnp.int32)
    )

    window = torch.hann_window(win, periodic=True)
    spec = torch.stft(
        torch.from_numpy(x), n_fft=n_fft, hop_length=hop, win_length=win,
        window=window, center=True, pad_mode="reflect", normalized=False,
        onesided=True, return_complex=True,
    )  # (B, F, T')
    power = (spec.real**2 + spec.imag**2).numpy().transpose(0, 2, 1)
    mel = power @ mel_filterbank(sr, n_fft, n_mels)
    want = np.log(np.maximum(mel, 1e-10))

    assert got.shape == want.shape
    assert int(got_lens[0]) == want.shape[1]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_transformer_lm_matches_torch():
    """The reference-architecture LM (embed_unit stage, no pos-enc) produces
    identical logits through the production weight translation: flax init ->
    export_torch_state_dict -> torch twin load_state_dict(strict) -> compare
    full forward AND the cached beam-step scorer against it."""
    from tailored_avsr_tpu.models.lm import TransformerLM
    from tailored_avsr_tpu.utils.torch_compat import export_torch_state_dict

    from tests.torch_twins import TorchTransformerLM

    V, EU, D, H, U, L = 13, 8, 16, 2, 24, 2
    lm = TransformerLM(vocab_size=V, att_unit=D, head=H, unit=U, layer=L,
                       dropout_rate=0.0, embed_unit=EU, pos_enc=None)
    toks = jnp.array([[1, 2, 3, 4, 0], [5, 6, 7, 0, 0]])
    lens = jnp.array([5, 3])
    variables = lm.init(jax.random.PRNGKey(5), toks, lens)
    got = np.asarray(lm.apply(variables, toks, lens))

    twin = TorchTransformerLM(V, EU, D, H, U, L)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(variables).items()}
    twin.load_state_dict(sd, strict=True)
    with torch.no_grad():
        want = twin(torch.from_numpy(np.asarray(toks)),
                    torch.from_numpy(np.asarray(lens))).numpy()
    valid = (np.arange(toks.shape[1])[None] < np.asarray(lens)[:, None])
    np.testing.assert_allclose(
        got * valid[..., None], want * valid[..., None], atol=2e-4, rtol=1e-4
    )

    # cached beam-step scorer consistency through the same weights: step
    # log-probs at position pos must match the full forward's row pos-1
    ys = jnp.array([[V - 1, 1, 2, 0], [V - 1, 5, 6, 0]])
    logp_step = np.asarray(
        lm.apply(variables, ys, jnp.array(3), method="score_step"))
    full = np.asarray(lm.apply(variables, ys, jnp.array([4, 4])))
    want_step = jax.nn.log_softmax(full[:, 2].astype(np.float32), axis=-1)
    np.testing.assert_allclose(logp_step, np.asarray(want_step), atol=2e-5)
