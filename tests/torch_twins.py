"""Minimal PyTorch twins of the reference op chain and the full flagship
AVSR graph, written from the SURVEY.md contracts (NOT imported from espnet,
NOT copied from /root/reference).

Two jobs:
1. Golden numerics: fp32 agreement of the flax ops with independent torch
   reimplementations, through the production ``utils/torch_compat`` weight
   translation (tests/test_torch_golden.py, tests/test_torch_flagship.py).
2. Measured baseline: a torch-CPU greedy decode of the flagship graph that
   ``scripts/bench_torch_baseline.py`` times against the JAX-CPU graph on
   identical hardware (VERDICT round-1 item 10).

Module/attribute naming follows the reference checkpoint key grammar
(tests/golden_keys.py) so ``load_state_dict(strict=True)`` accepts a
translated export of the flax tree: e.g. ``encoder.encoders.3.acoustic_attn.
linear_q.weight``, ``visual_frontend.trunk.layer2.0.downsample.0.weight``.
Ref structure: /root/reference/src/encoder/audiovisual/tailored/encoder.py
:101-216, src/embedding_for_avsr/default.py:52-106, src/frontend/
conv3d_resnet18/conv3d_resnet18.py:47-74.
"""

from __future__ import annotations

import math

import numpy as np
import torch


# ---------------------------------------------------------------------------
# op twins
# ---------------------------------------------------------------------------


class TorchRelPosMHA(torch.nn.Module):
    """espnet RelPositionMultiHeadedAttention semantics (latest rel_pos_type)."""

    def __init__(self, d, h):
        super().__init__()
        self.h, self.dk = h, d // h
        self.linear_q = torch.nn.Linear(d, d)
        self.linear_k = torch.nn.Linear(d, d)
        self.linear_v = torch.nn.Linear(d, d)
        self.linear_out = torch.nn.Linear(d, d)
        self.linear_pos = torch.nn.Linear(d, d, bias=False)
        self.pos_bias_u = torch.nn.Parameter(torch.randn(h, d // h) * 0.1)
        self.pos_bias_v = torch.nn.Parameter(torch.randn(h, d // h) * 0.1)

    @staticmethod
    def rel_shift(x):
        b, h, t, _ = x.shape
        zp = torch.zeros(b, h, t, 1)
        xp = torch.cat([zp, x], dim=-1).view(b, h, 2 * t, t)
        return xp[:, :, 1:].reshape(b, h, t, 2 * t - 1)[:, :, :, :t]

    def forward(self, x, pos_emb, mask=None):
        b, t, d = x.shape
        q = self.linear_q(x).view(b, t, self.h, self.dk)
        k = self.linear_k(x).view(b, t, self.h, self.dk).transpose(1, 2)
        v = self.linear_v(x).view(b, t, self.h, self.dk).transpose(1, 2)
        p = self.linear_pos(pos_emb).view(
            pos_emb.shape[0], -1, self.h, self.dk
        ).transpose(1, 2)
        q_u = (q + self.pos_bias_u).transpose(1, 2)
        q_v = (q + self.pos_bias_v).transpose(1, 2)
        ac = torch.matmul(q_u, k.transpose(-2, -1))
        bd = self.rel_shift(torch.matmul(q_v, p.transpose(-2, -1)))
        scores = (ac + bd) / math.sqrt(self.dk)
        if mask is not None:
            scores = scores.masked_fill(
                ~mask[:, None, None, :], torch.finfo(scores.dtype).min
            )
        attn = torch.softmax(scores, dim=-1)
        if mask is not None:
            attn = attn.masked_fill(~mask[:, None, None, :], 0.0)
        out = torch.matmul(attn, v).transpose(1, 2).reshape(b, t, d)
        return self.linear_out(out)


class TorchMHA(torch.nn.Module):
    """espnet MultiHeadedAttention (absolute; decoder self/src attention)."""

    def __init__(self, d, h):
        super().__init__()
        self.h, self.dk = h, d // h
        self.linear_q = torch.nn.Linear(d, d)
        self.linear_k = torch.nn.Linear(d, d)
        self.linear_v = torch.nn.Linear(d, d)
        self.linear_out = torch.nn.Linear(d, d)

    def forward(self, q_in, k_in, v_in, mask=None):
        b, tq = q_in.shape[:2]
        tk = k_in.shape[1]
        q = self.linear_q(q_in).view(b, tq, self.h, self.dk).transpose(1, 2)
        k = self.linear_k(k_in).view(b, tk, self.h, self.dk).transpose(1, 2)
        v = self.linear_v(v_in).view(b, tk, self.h, self.dk).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-2, -1)) / math.sqrt(self.dk)
        if mask is not None:
            # mask: (B, Tk) valid keys, or (B, Tq, Tk)
            m = mask[:, None, None, :] if mask.dim() == 2 else mask[:, None]
            scores = scores.masked_fill(~m, torch.finfo(scores.dtype).min)
        attn = torch.softmax(scores, dim=-1)
        if mask is not None:
            attn = attn.masked_fill(~m, 0.0)
        out = torch.matmul(attn, v).transpose(1, 2).reshape(b, tq, -1)
        return self.linear_out(out)


class _CSGU(torch.nn.Module):
    def __init__(self, units, kernel):
        super().__init__()
        half = units // 2
        self.norm = torch.nn.LayerNorm(half)
        self.conv = torch.nn.Conv1d(
            half, half, kernel, padding=(kernel - 1) // 2, groups=half
        )

    def forward(self, h):
        x_r, x_g = h.chunk(2, dim=-1)
        x_g = self.conv(self.norm(x_g).transpose(1, 2)).transpose(1, 2)
        return x_r * x_g


class TorchCgMLP(torch.nn.Module):
    """espnet ConvolutionalGatingMLP; espnet attribute naming
    (``channel_proj1`` = Sequential(Linear, GELU), csgu.norm/conv)."""

    def __init__(self, d, units, kernel):
        super().__init__()
        self.channel_proj1 = torch.nn.Sequential(
            torch.nn.Linear(d, units), torch.nn.GELU()
        )
        self.csgu = _CSGU(units, kernel)
        self.channel_proj2 = torch.nn.Linear(units // 2, d)

    def forward(self, x):
        return self.channel_proj2(self.csgu(self.channel_proj1(x)))


class TorchBasicBlock(torch.nn.Module):
    def __init__(self, inplanes, planes, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(
            inplanes, planes, 3, stride=stride, padding=1, bias=False
        )
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(inplanes, planes, 1, stride=stride, bias=False),
                torch.nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        residual = x if self.downsample is None else self.downsample(x)
        out = torch.nn.functional.silu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.nn.functional.silu(out + residual)


class TorchFFN(torch.nn.Module):
    """espnet PositionwiseFeedForward. The encoder/fusion FFNs use swish
    (config ffn_activation_type); the decoder keeps espnet's relu default."""

    def __init__(self, d, units, d_out=None, activation="silu"):
        super().__init__()
        self.w_1 = torch.nn.Linear(d, units)
        self.w_2 = torch.nn.Linear(units, d if d_out is None else d_out)
        self._act = {
            "silu": torch.nn.functional.silu,
            "relu": torch.nn.functional.relu,
        }[activation]

    def forward(self, x):
        return self.w_2(self._act(self.w_1(x)))


# ---------------------------------------------------------------------------
# frontends / embeds
# ---------------------------------------------------------------------------


def torch_logmel(x: torch.Tensor, n_fft=512, win=400, hop=160, n_mels=80,
                 sr=16000):
    """espnet DefaultFrontend numerics: torch.stft center/reflect + Slaney
    mel + clamp(1e-10).log(). Returns (B, T', n_mels)."""
    from tailored_avsr_tpu.ops.frontend_audio import mel_filterbank

    window = torch.hann_window(win, periodic=True)
    spec = torch.stft(
        x, n_fft=n_fft, hop_length=hop, win_length=win, window=window,
        center=True, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    )
    power = (spec.real ** 2 + spec.imag ** 2).transpose(1, 2)  # (B, T', F)
    mel = power @ torch.from_numpy(
        mel_filterbank(sr, n_fft, n_mels).astype(np.float32)
    )
    return torch.log(torch.clamp(mel, min=1e-10))


def utterance_mvn(x: torch.Tensor, lengths: torch.Tensor):
    """norm_means-only utterance MVN over valid frames; zero the padding."""
    mask = (
        torch.arange(x.shape[1])[None, :] < lengths[:, None]
    ).to(x.dtype)[..., None]
    n = lengths.clamp(min=1).to(x.dtype)[:, None, None]
    mean = (x * mask).sum(dim=1, keepdim=True) / n
    return (x - mean) * mask


class TorchConv2dSubsamplingWOPosEnc(torch.nn.Module):
    """espnet Conv2dSubsamplingWOPosEnc (k=[3,3] s=[2,2]): VALID convs over
    (time, freq), channel-major flatten, Linear out."""

    def __init__(self, d, feat=80):
        super().__init__()
        self.conv = torch.nn.Sequential(
            torch.nn.Conv2d(1, d, 3, 2), torch.nn.ReLU(),
            torch.nn.Conv2d(d, d, 3, 2), torch.nn.ReLU(),
        )
        f = (feat - 3) // 2 + 1
        f = (f - 3) // 2 + 1
        self.out = torch.nn.Linear(d * f, d)

    def forward(self, x):
        h = self.conv(x.unsqueeze(1))  # (B, C, T', F')
        b, c, t, f = h.shape
        return self.out(h.transpose(1, 2).reshape(b, t, c * f))


class _Trunk(torch.nn.Module):
    def __init__(self):
        super().__init__()
        inplanes = 64
        for stage, planes in enumerate((64, 128, 256, 512), start=1):
            blocks = []
            for b in range(2):
                stride = 2 if (stage > 1 and b == 0) else 1
                blocks.append(TorchBasicBlock(inplanes, planes, stride))
                inplanes = planes
            setattr(self, f"layer{stage}", torch.nn.Sequential(*blocks))

    def forward(self, x):
        for stage in (1, 2, 3, 4):
            x = getattr(self, f"layer{stage}")(x)
        return x


class TorchVisualFrontend(torch.nn.Module):
    """Conv3D stem + per-frame ResNet-18 trunk (conv3d_resnet18.py:47-74)."""

    def __init__(self):
        super().__init__()
        self.frontend3D = torch.nn.Sequential(
            torch.nn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            torch.nn.BatchNorm3d(64),
            torch.nn.SiLU(),
            torch.nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
        )
        self.trunk = _Trunk()

    def forward(self, video):
        """(B, T, H, W) -> (B, T, 512)."""
        b, t = video.shape[:2]
        x = self.frontend3D(video.unsqueeze(1))  # (B, 64, T, H', W')
        x = x.transpose(1, 2).reshape(b * t, 64, x.shape[3], x.shape[4])
        x = self.trunk(x)
        return x.mean(dim=(2, 3)).reshape(b, t, 512)


class _AcousticEmbed(torch.nn.Module):
    def __init__(self, d, feat=80):
        super().__init__()
        self.embed = TorchConv2dSubsamplingWOPosEnc(d, feat)


class _VisualEmbed(torch.nn.Module):
    def __init__(self, d, in_dim=512):
        super().__init__()
        self.embed = torch.nn.Sequential(
            torch.nn.Linear(in_dim, d), torch.nn.LayerNorm(d)
        )


# ---------------------------------------------------------------------------
# tailored encoder / fusion / decoder
# ---------------------------------------------------------------------------


class TorchTailoredLayer(torch.nn.Module):
    """Tailored AV layer (tailored/encoder_layer.py:81-116): shared macaron
    FFN -> per-modality branch (MHA | cgMLP) -> shared FFN -> shared norm."""

    def __init__(self, d, h, units, cgmlp_units, cgmlp_kernel,
                 acoustic_attn: bool, visual_attn: bool):
        super().__init__()
        self.acoustic_use_attn = acoustic_attn
        self.visual_use_attn = visual_attn
        self.feed_forward = TorchFFN(d, units)
        self.feed_forward_macaron = TorchFFN(d, units)
        self.norm_ff = torch.nn.LayerNorm(d)
        self.norm_ff_macaron = torch.nn.LayerNorm(d)
        self.norm_final = torch.nn.LayerNorm(d)
        for mod, attn in (("acoustic", acoustic_attn), ("visual", visual_attn)):
            if attn:
                setattr(self, f"{mod}_attn", TorchRelPosMHA(d, h))
                setattr(self, f"{mod}_norm_mha", torch.nn.LayerNorm(d))
            else:
                setattr(
                    self, f"{mod}_cgmlp",
                    TorchCgMLP(d, cgmlp_units, cgmlp_kernel),
                )
                setattr(self, f"{mod}_norm_cgmlp", torch.nn.LayerNorm(d))

    def _branch(self, x, pos, mask, mod, use_attn):
        if use_attn:
            h = getattr(self, f"{mod}_norm_mha")(x)
            return x + getattr(self, f"{mod}_attn")(h, pos, mask)
        h = getattr(self, f"{mod}_norm_cgmlp")(x)
        return x + getattr(self, f"{mod}_cgmlp")(h)

    def forward(self, a, a_pos, a_mask, v, v_pos, v_mask):
        a = a + 0.5 * self.feed_forward_macaron(self.norm_ff_macaron(a))
        v = v + 0.5 * self.feed_forward_macaron(self.norm_ff_macaron(v))
        a = self._branch(a, a_pos, a_mask, "acoustic", self.acoustic_use_attn)
        v = self._branch(v, v_pos, v_mask, "visual", self.visual_use_attn)
        a = self.norm_final(a + 0.5 * self.feed_forward(self.norm_ff(a)))
        v = self.norm_final(v + 0.5 * self.feed_forward(self.norm_ff(v)))
        return a, v


class TorchTailoredEncoder(torch.nn.Module):
    def __init__(self, d, h, units, cgmlp_units, cgmlp_kernel,
                 acoustic_use_attn, visual_use_attn):
        super().__init__()
        self.modality_encoding = torch.nn.Embedding(2, d)
        self.encoders = torch.nn.ModuleList([
            TorchTailoredLayer(d, h, units, cgmlp_units, cgmlp_kernel, aa, va)
            for aa, va in zip(acoustic_use_attn, visual_use_attn)
        ])
        self.after_norm = torch.nn.LayerNorm(d)

    def forward(self, a, a_pos, a_mask, v, v_pos, v_mask):
        mod = self.modality_encoding.weight
        a = a + mod[0]
        v = v + mod[1]
        for layer in self.encoders:
            a, v = layer(a, a_pos, a_mask, v, v_pos, v_mask)
        return self.after_norm(a), self.after_norm(v)


class TorchAdaptiveFusion(torch.nn.Module):
    """learned_ave adaptive fusion (adaptive_audiovisual_fusion.py:59-108)."""

    def __init__(self, d, hidden):
        super().__init__()
        self.audiovisual_layer = TorchFFN(d, hidden)
        self.acoustic_pooling_proj = torch.nn.Linear(d, 1)
        self.visual_pooling_proj = torch.nn.Linear(d, 1)
        self.acoustic_weight_proj = torch.nn.Linear(d, 1)
        self.visual_weight_proj = torch.nn.Linear(d, 1)
        self.norm_final = torch.nn.LayerNorm(d)

    @staticmethod
    def _pool_weight(x, mask, pooling_proj, weight_proj):
        d = x.shape[-1]
        score = pooling_proj(x).squeeze(-1) / math.sqrt(d)  # (B, T)
        if mask is not None:
            score = score.masked_fill(~mask, torch.finfo(score.dtype).min)
        w = torch.softmax(score, dim=-1)
        if mask is not None:
            w = w.masked_fill(~mask, 0.0)
        pooled = torch.einsum("bt,btd->bd", w, x)
        return weight_proj(pooled)  # (B, 1)

    def forward(self, a, a_mask, v, v_mask):
        wa = self._pool_weight(
            a, a_mask, self.acoustic_pooling_proj, self.acoustic_weight_proj
        )
        wv = self._pool_weight(
            v, v_mask, self.visual_pooling_proj, self.visual_weight_proj
        )
        w = torch.softmax(torch.cat([wa, wv], dim=-1), dim=-1)  # (B, 2)
        av = self.audiovisual_layer(
            w[:, 0, None, None] * a + w[:, 1, None, None] * v
        )
        av = self.norm_final(av)
        av_mask = None
        if a_mask is not None or v_mask is not None:
            av_mask = a_mask | v_mask
        return av, av_mask, w


class TorchConcatFusion(torch.nn.Module):
    """concat adaptive fusion (adaptive_audiovisual_fusion.py merge='concat'):
    FFN over [audio; video] with no modality gate."""

    def __init__(self, d, hidden):
        super().__init__()
        self.audiovisual_layer = TorchFFN(2 * d, hidden, d_out=d)
        self.norm_final = torch.nn.LayerNorm(d)

    def forward(self, a, a_mask, v, v_mask):
        av = self.norm_final(
            self.audiovisual_layer(torch.cat([a, v], dim=-1))
        )
        av_mask = None
        if a_mask is not None or v_mask is not None:
            av_mask = a_mask | v_mask
        return av, av_mask, None


class TorchDecoderLayer(torch.nn.Module):
    def __init__(self, d, h, units):
        super().__init__()
        self.self_attn = TorchMHA(d, h)
        self.src_attn = TorchMHA(d, h)
        self.feed_forward = TorchFFN(d, units, activation="relu")
        self.norm1 = torch.nn.LayerNorm(d)
        self.norm2 = torch.nn.LayerNorm(d)
        self.norm3 = torch.nn.LayerNorm(d)

    def forward(self, x, tgt_mask, memory, memory_mask):
        h = self.norm1(x)
        x = x + self.self_attn(h, h, h, tgt_mask)
        h = self.norm2(x)
        x = x + self.src_attn(h, memory, memory, memory_mask)
        h = self.norm3(x)
        return x + self.feed_forward(h)


class TorchTransformerDecoder(torch.nn.Module):
    """espnet TransformerDecoder: embed = Sequential(Embedding, abs-pos)."""

    def __init__(self, vocab, d, h, units, num_blocks):
        super().__init__()
        self.d = d
        self.embed = torch.nn.Sequential(torch.nn.Embedding(vocab, d))
        self.decoders = torch.nn.ModuleList(
            [TorchDecoderLayer(d, h, units) for _ in range(num_blocks)]
        )
        self.after_norm = torch.nn.LayerNorm(d)
        self.output_layer = torch.nn.Linear(d, vocab)

    def forward(self, ys_in, ys_lens, memory, memory_mask):
        from tailored_avsr_tpu.ops.posenc import abs_pos_table

        b, t = ys_in.shape
        x = self.embed[0](ys_in) * math.sqrt(self.d)
        x = x + torch.from_numpy(
            np.asarray(abs_pos_table(t, self.d), np.float32)
        )[None]
        causal = torch.tril(torch.ones(t, t, dtype=torch.bool))
        valid = torch.arange(t)[None, :] < ys_lens[:, None]
        tgt_mask = causal[None] & valid[:, None, :]
        for layer in self.decoders:
            x = layer(x, tgt_mask, memory, memory_mask)
        return self.output_layer(self.after_norm(x))


class _CTC(torch.nn.Module):
    def __init__(self, d, vocab):
        super().__init__()
        self.ctc_lo = torch.nn.Linear(d, vocab)


# ---------------------------------------------------------------------------
# the flagship graph
# ---------------------------------------------------------------------------


class TorchAVSRFlagship(torch.nn.Module):
    """Torch twin of the flagship tailored AVSR model
    (configs/AVSR/tailored_transformer+ctc_spanish.yaml): log-mel + MVN ->
    conv2d x4 subsample | Conv3D-ResNet18 -> linear+LN, align, rel-pos,
    modality embed, 12 tailored layers, adaptive fusion, CTC (+ AR decoder).
    state_dict keys == tests/golden_keys.avsr_tailored_keys."""

    IGNORE_ID = -1.0

    def __init__(self, vocab, d=256, h=4, units=2048, cgmlp_units=2048,
                 cgmlp_kernel=31,
                 acoustic_use_attn=(False, True, True, True, False, True,
                                    False, True, False, True, True, True),
                 visual_use_attn=(True, True, True, True, False, True, True,
                                  True, True, True, True, True),
                 dec_blocks=6, fusion_merge="learned_ave"):
        super().__init__()
        self.d = d
        self.visual_frontend = TorchVisualFrontend()
        self.acoustic_embed = _AcousticEmbed(d)
        self.visual_embed = _VisualEmbed(d)
        self.encoder = TorchTailoredEncoder(
            d, h, units, cgmlp_units, cgmlp_kernel,
            acoustic_use_attn, visual_use_attn,
        )
        self.audiovisual_fusion = (
            TorchConcatFusion(d, units) if fusion_merge == "concat"
            else TorchAdaptiveFusion(d, units)
        )
        self.decoder = TorchTransformerDecoder(vocab, d, h, units, dec_blocks)
        self.ctc = _CTC(d, vocab)

    @staticmethod
    def _sub4_len(n):
        n = (n - 3) // 2 + 1
        return (n - 3) // 2 + 1

    def encode(self, audio, audio_lengths, video, video_lengths):
        """Returns (enc_out (B,T,D), enc_lens, av_mask)."""
        from tailored_avsr_tpu.ops.posenc import rel_pos_table

        a = torch_logmel(audio)
        a_lens = 1 + torch.div(audio_lengths, 160, rounding_mode="floor")
        a = utterance_mvn(a, a_lens)
        a = self.acoustic_embed.embed(a)
        a_lens = self._sub4_len(a_lens)
        v = self.visual_frontend(video)
        v = self.visual_embed.embed(v)
        v_lens = video_lengths

        ta, tv = a.shape[1], v.shape[1]
        a_mask = torch.arange(ta)[None, :] < a_lens[:, None]
        v_mask = torch.arange(tv)[None, :] < v_lens[:, None]
        if ta < tv:
            a = torch.nn.functional.pad(a, (0, 0, 0, tv - ta),
                                        value=self.IGNORE_ID)
            a_mask = torch.nn.functional.pad(a_mask, (0, tv - ta))
        elif tv < ta:
            v = torch.nn.functional.pad(v, (0, 0, 0, ta - tv),
                                        value=self.IGNORE_ID)
            v_mask = torch.nn.functional.pad(v_mask, (0, ta - tv))

        t = a.shape[1]
        pos = torch.from_numpy(
            np.asarray(rel_pos_table(t, self.d), np.float32)
        )[None]
        scale = math.sqrt(self.d)
        a_out, v_out = self.encoder(
            a * scale, pos, a_mask, v * scale, pos, v_mask
        )
        av, av_mask, _ = self.audiovisual_fusion(a_out, a_mask, v_out, v_mask)
        return av, av_mask.sum(dim=-1), av_mask

    def ctc_greedy(self, audio, audio_lengths, video, video_lengths):
        enc, enc_lens, _ = self.encode(
            audio, audio_lengths, video, video_lengths
        )
        return self.ctc.ctc_lo(enc).argmax(dim=-1), enc_lens

    def decoder_forward(self, audio, audio_lengths, video, video_lengths,
                        ys_in, ys_lens):
        enc, enc_lens, av_mask = self.encode(
            audio, audio_lengths, video, video_lengths
        )
        return self.decoder(ys_in, ys_lens, enc, av_mask)


class TorchLMLayer(torch.nn.Module):
    """espnet transformer EncoderLayer as the LM uses it (pre-norm, vanilla
    self-attn, relu FFN)."""

    def __init__(self, d, h, units):
        super().__init__()
        self.self_attn = TorchMHA(d, h)
        self.feed_forward = TorchFFN(d, units, activation="relu")
        self.norm1 = torch.nn.LayerNorm(d)
        self.norm2 = torch.nn.LayerNorm(d)

    def forward(self, x, mask):
        h = self.norm1(x)
        x = x + self.self_attn(h, h, h, mask)
        h = self.norm2(x)
        return x + self.feed_forward(h)


class TorchTransformerLM(torch.nn.Module):
    """espnet2 TransformerLM as the reference LM config builds it
    (configs/LM/lm-spanish.yaml: embed_unit 128, pos_enc null): Embedding ->
    encoder input stack Linear+LN+ReLU (input_layer='linear', pos_enc_class
    = empty Sequential) -> pre-norm layers -> after_norm -> decoder Linear.
    State dict grammar matches the real checkpoints (lm.* keys via the
    `lm` submodule attribute of ESPnetLanguageModel)."""

    def __init__(self, vocab, embed_unit, d, h, units, layers):
        super().__init__()

        class _Inner(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.embed = torch.nn.Embedding(vocab, embed_unit)

                class _Enc(torch.nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.embed = torch.nn.Sequential(
                            torch.nn.Linear(embed_unit, d),
                            torch.nn.LayerNorm(d),
                            torch.nn.Dropout(0.0),
                            torch.nn.ReLU(),
                        )
                        self.encoders = torch.nn.ModuleList(
                            [TorchLMLayer(d, h, units) for _ in range(layers)]
                        )
                        self.after_norm = torch.nn.LayerNorm(d)

                self.encoder = _Enc()
                self.decoder = torch.nn.Linear(d, vocab)

        self.lm = _Inner()

    def forward(self, tokens, lengths):
        b, t = tokens.shape
        x = self.lm.encoder.embed(self.lm.embed(tokens))
        causal = torch.tril(torch.ones(t, t, dtype=torch.bool))
        valid = torch.arange(t)[None, :] < lengths[:, None]
        mask = causal[None] & valid[:, None, :]
        for layer in self.lm.encoder.encoders:
            x = layer(x, mask)
        return self.lm.decoder(self.lm.encoder.after_norm(x))
