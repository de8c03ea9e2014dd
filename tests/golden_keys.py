"""Golden torch state_dict key sets per checkpoint family, transcribed from
the reference/espnet module trees (NOT generated from our own code) so that
``export_torch_state_dict`` / ``load_torch_state_dict`` are checked against
the exact key inventory a real Zenodo checkpoint carries.

Sources transcribed:
- branchformer encoder: /root/reference/src/encoder/branchformer/encoder.py
  :123-170 (embed variants), encoder_layer.py:85-142 (layer modules);
- tailored AV encoder: /root/reference/src/encoder/audiovisual/tailored/
  encoder.py:101-216, encoder_layer.py:81-116;
- AVSR embeds: /root/reference/src/embedding_for_avsr/default.py:52-106;
- adaptive fusion: /root/reference/src/audiovisual_fusion/
  adaptive_audiovisual_fusion.py:59-108;
- visual frontend: /root/reference/src/frontend/conv3d_resnet18/
  conv3d_resnet18.py:47-74, modules/resnet.py:25-178;
- espnet==202402 TransformerDecoder / Conv2dSubsampling / CTC key grammar
  (decoder.embed.0, decoder.decoders.{i}, ctc.ctc_lo).

torch BatchNorm state_dicts also carry ``num_batches_tracked`` buffers; they
have no flax counterpart and the loader ignores them (report['ignored']).
"""


def _wb(p):
    return {p + ".weight", p + ".bias"}


def _norm(p):
    return _wb(p)


def _bn(p, tracked=True):
    keys = _wb(p) | {p + ".running_mean", p + ".running_var"}
    if tracked:
        keys.add(p + ".num_batches_tracked")
    return keys


def rel_attn_keys(p):
    """espnet RelPositionMultiHeadedAttention."""
    out = set()
    for m in ("linear_q", "linear_k", "linear_v", "linear_out"):
        out |= _wb(f"{p}.{m}")
    out.add(p + ".linear_pos.weight")  # bias=False
    out |= {p + ".pos_bias_u", p + ".pos_bias_v"}
    return out


def cgmlp_keys(p):
    """espnet ConvolutionalGatingMLP (channel_proj1 = Sequential(Linear, GELU))."""
    return (
        _wb(p + ".channel_proj1.0")
        | _norm(p + ".csgu.norm")
        | _wb(p + ".csgu.conv")
        | _wb(p + ".channel_proj2")
    )


def ffn_keys(p):
    return _wb(p + ".w_1") | _wb(p + ".w_2")


def branchformer_layer_keys(p, merge_method="learned_ave"):
    """Reference MyBranchformerEncoderLayer with both branches + macaron
    (encoder_layer.py:85-142)."""
    keys = (
        rel_attn_keys(p + ".attn")
        | cgmlp_keys(p + ".cgmlp")
        | ffn_keys(p + ".feed_forward")
        | ffn_keys(p + ".feed_forward_macaron")
        | _norm(p + ".norm_ff")
        | _norm(p + ".norm_ff_macaron")
        | _norm(p + ".norm_mha")
        | _norm(p + ".norm_mlp")
        | _norm(p + ".norm_final")
        | _wb(p + ".merge_proj")
    )
    if merge_method == "learned_ave":
        for m in ("pooling_proj1", "pooling_proj2", "weight_proj1", "weight_proj2"):
            keys |= _wb(f"{p}.{m}")
    return keys


def conv2d_subsampling_keys(p, wo_posenc=False):
    """espnet Conv2dSubsampling[WOPosEnc]: conv Sequential indices 0/2; the
    with-posenc variant wraps the Linear in Sequential(out.0, pos_enc)."""
    out_key = p + ".out.weight" if wo_posenc else p + ".out.0.weight"
    out_b = p + ".out.bias" if wo_posenc else p + ".out.0.bias"
    return _wb(p + ".conv.0") | _wb(p + ".conv.2") | {out_key, out_b}


def transformer_decoder_keys(p="decoder", num_blocks=6):
    keys = {p + ".embed.0.weight"} | _norm(p + ".after_norm") | _wb(
        p + ".output_layer"
    )
    for i in range(num_blocks):
        q = f"{p}.decoders.{i}"
        for att in ("self_attn", "src_attn"):
            for m in ("linear_q", "linear_k", "linear_v", "linear_out"):
                keys |= _wb(f"{q}.{att}.{m}")
        keys |= ffn_keys(q + ".feed_forward")
        keys |= _norm(q + ".norm1") | _norm(q + ".norm2") | _norm(q + ".norm3")
    return keys


def resnet18_frontend_keys(p="frontend"):
    """Conv3d stem + ResNet-18 trunk (conv3d_resnet18.py:47-74, resnet.py)."""
    keys = {p + ".frontend3D.0.weight"} | _bn(p + ".frontend3D.1")
    for stage, blocks in enumerate([2, 2, 2, 2], start=1):
        for b in range(blocks):
            q = f"{p}.trunk.layer{stage}.{b}"
            keys |= {q + ".conv1.weight", q + ".conv2.weight"}
            keys |= _bn(q + ".bn1") | _bn(q + ".bn2")
            if stage > 1 and b == 0:  # downsample_basic_block (resnet.py:25-41)
                keys |= {q + ".downsample.0.weight"} | _bn(q + ".downsample.1")
    return keys


def tailored_layer_keys(p, acoustic_attn: bool, visual_attn: bool):
    """Tailored AV layer (tailored/encoder_layer.py:81-116): one branch per
    modality (attn OR cgmlp, norm named after the branch), shared FFNs."""
    keys = (
        ffn_keys(p + ".feed_forward")
        | ffn_keys(p + ".feed_forward_macaron")
        | _norm(p + ".norm_ff")
        | _norm(p + ".norm_ff_macaron")
        | _norm(p + ".norm_final")
    )
    for mod, has_attn in (("acoustic", acoustic_attn), ("visual", visual_attn)):
        if has_attn:
            keys |= rel_attn_keys(f"{p}.{mod}_attn") | _norm(f"{p}.{mod}_norm_mha")
        else:
            keys |= cgmlp_keys(f"{p}.{mod}_cgmlp") | _norm(
                f"{p}.{mod}_norm_cgmlp"
            )
    return keys


def adaptive_fusion_keys(p="audiovisual_fusion", merge_method="learned_ave"):
    keys = ffn_keys(p + ".audiovisual_layer") | _norm(p + ".norm_final")
    if merge_method == "learned_ave":
        for m in (
            "acoustic_pooling_proj", "visual_pooling_proj",
            "acoustic_weight_proj", "visual_weight_proj",
        ):
            keys |= _wb(f"{p}.{m}")
    return keys


# ---------------------------------------------------------------------------
# full families (the three shipped flagship configs)
# ---------------------------------------------------------------------------


def asr_branchformer_keys(num_blocks=12, dec_blocks=6):
    """configs/ASR/branchformer_transformer+ctc_spanish.yaml family."""
    keys = conv2d_subsampling_keys("encoder.embed") | _norm("encoder.after_norm")
    for i in range(num_blocks):
        keys |= branchformer_layer_keys(f"encoder.encoders.{i}")
    keys |= transformer_decoder_keys("decoder", dec_blocks)
    keys |= _wb("ctc.ctc_lo")
    return keys


def vsr_branchformer_keys(num_blocks=12, dec_blocks=6):
    """configs/VSR/conv3dresnet18_branchformer_transformer+ctc_spanish.yaml family: ResNet
    frontend; encoder embed = Sequential(Linear(512, d), pos_enc) -> embed.0
    (encoder.py:130-134)."""
    keys = resnet18_frontend_keys("frontend")
    keys |= _wb("encoder.embed.0") | _norm("encoder.after_norm")
    for i in range(num_blocks):
        keys |= branchformer_layer_keys(f"encoder.encoders.{i}")
    keys |= transformer_decoder_keys("decoder", dec_blocks)
    keys |= _wb("ctc.ctc_lo")
    return keys


def avsr_tailored_keys(acoustic_use_attn, visual_use_attn, dec_blocks=6):
    """configs/AVSR/tailored_transformer+ctc_spanish.yaml family."""
    keys = resnet18_frontend_keys("visual_frontend")
    # acoustic embed: Conv2dSubsamplingWOPosEnc (default.py:64-70)
    keys |= conv2d_subsampling_keys("acoustic_embed.embed", wo_posenc=True)
    # visual embed: Sequential(Linear, LayerNorm) (default.py:58-62)
    keys |= _wb("visual_embed.embed.0") | _norm("visual_embed.embed.1")
    keys |= {"encoder.modality_encoding.weight"} | _norm("encoder.after_norm")
    for i, (aa, va) in enumerate(zip(acoustic_use_attn, visual_use_attn)):
        keys |= tailored_layer_keys(f"encoder.encoders.{i}", aa, va)
    keys |= adaptive_fusion_keys()
    keys |= transformer_decoder_keys("decoder", dec_blocks)
    keys |= _wb("ctc.ctc_lo")
    return keys


def lm_keys(layers=16):
    """configs/LM/lm-spanish.yaml family: espnet2 ESPnetLanguageModel wrapping
    TransformerLM (espnet2/lm/transformer_lm.py) — everything under ``lm.``:
    embed (embed_unit-d) -> encoder (input_layer='linear': embed.0 Linear +
    embed.1 LayerNorm; pos_enc null => no pos-enc params) -> decoder Linear."""
    keys = {"lm.embed.weight"}
    keys |= _wb("lm.encoder.embed.0") | _norm("lm.encoder.embed.1")
    for i in range(layers):
        p = f"lm.encoder.encoders.{i}"
        for m in ("linear_q", "linear_k", "linear_v", "linear_out"):
            keys |= _wb(f"{p}.self_attn.{m}")
        keys |= ffn_keys(p + ".feed_forward")
        keys |= _norm(p + ".norm1") | _norm(p + ".norm2")
    keys |= _norm("lm.encoder.after_norm")
    keys |= _wb("lm.decoder")
    return keys


def transducer_keys(num_blocks=12, pred_layers=1):
    """ASR branchformer + transducer branch: espnet2 TransducerDecoder
    (decoder.embed + decoder.decoder.{i} packed LSTMs) and JointNetwork
    (lin_enc with bias, lin_dec without, lin_out) per the classes imported at
    /root/reference/src/tasks/asr.py:20,73."""
    keys = conv2d_subsampling_keys("encoder.embed") | _norm("encoder.after_norm")
    for i in range(num_blocks):
        keys |= branchformer_layer_keys(f"encoder.encoders.{i}")
    keys |= {"decoder.embed.weight"}
    for i in range(pred_layers):
        p = f"decoder.decoder.{i}"
        keys |= {f"{p}.weight_ih_l0", f"{p}.weight_hh_l0",
                 f"{p}.bias_ih_l0", f"{p}.bias_hh_l0"}
    keys |= _wb("joint_network.lin_enc") | {"joint_network.lin_dec.weight"}
    keys |= _wb("joint_network.lin_out")
    keys |= _wb("ctc.ctc_lo")
    return keys
