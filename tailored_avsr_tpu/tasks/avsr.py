"""AVSR task factory: config -> dual-stream E2E model.

Capability parity with ``AVSRTask.build_model`` (/root/reference/src/tasks/
avsr.py:506-718): dual-stream registries (acoustic/visual frontends, embeds),
unified encoder ('tailored'/'conventional'), 'adaptive' fusion, decoder, model
('espnet'/'maskctc'); enforces embed pos-enc parity (ref :613-615) and wires
fusion after the encoder (:636-641).
"""

from __future__ import annotations

from typing import List

from tailored_avsr_tpu.models.avsr_model import AVSRModel
from tailored_avsr_tpu.models.conventional import ConventionalEncoder
from tailored_avsr_tpu.models.ctc import CTCHead
from tailored_avsr_tpu.models.embedding import DefaultEmbeddingLayerForAVSR
from tailored_avsr_tpu.models.fusion import AdaptiveAudioVisualFusion
from tailored_avsr_tpu.models.maskctc import AVSRMaskCTCModel
from tailored_avsr_tpu.models.tailored import TailoredEncoder
from tailored_avsr_tpu.tasks.common import (
    build_transducer_modules,
    check_dropped_key,
    build_decoder,
    build_frontend,
    build_normalize,
    build_postencoder,
    build_preencoder,
    build_specaug,
    decoder_name_is_transducer,
    filter_conf,
)


class AVSRTask:
    @classmethod
    def build_model(cls, config, token_list: List[str]):
        model_conf = dict(getattr(config, "model_conf", {}) or {})
        model_name = getattr(config, "model", "espnet") or "espnet"

        # multi-blank transducer vocab extension (in place; see ASRTask)
        mb_durations = tuple(
            int(d) for d in model_conf.get("transducer_multi_blank_durations") or ()
        )
        if mb_durations:
            blank_idx = token_list.index(model_conf.get("sym_blank", "<blank>"))
            for dur in mb_durations:
                if f"<blank{dur}>" not in token_list:
                    token_list.insert(blank_idx, f"<blank{dur}>")
        vocab_size = len(token_list)

        acoustic_frontend = build_frontend(
            getattr(config, "acoustic_frontend", "default"),
            getattr(config, "acoustic_frontend_conf", {}),
        )
        visual_frontend = build_frontend(
            getattr(config, "visual_frontend", "conv3dresnet18"),
            getattr(config, "visual_frontend_conf", {}),
        )
        specaug = build_specaug(
            getattr(config, "specaug", None), getattr(config, "specaug_conf", {})
        )
        feature_size = (
            acoustic_frontend.output_size() if acoustic_frontend is not None else 80
        )
        normalize = build_normalize(
            getattr(config, "normalize", None),
            getattr(config, "normalize_conf", {}),
            feature_size,
        )

        encoder_conf = dict(getattr(config, "encoder_conf", {}) or {})
        output_size = int(encoder_conf.get("output_size", 256))

        a_embed_conf = dict(getattr(config, "acoustic_embed_conf", {}) or {})
        v_embed_conf = dict(getattr(config, "visual_embed_conf", {}) or {})
        # pos-enc parity between the two streams (ref avsr.py:613-615)
        a_pos = a_embed_conf.get("pos_enc_layer_type", "rel_pos")
        v_pos = v_embed_conf.get("pos_enc_layer_type", "rel_pos")
        assert a_pos == v_pos, (
            f"acoustic and visual embeds must share pos_enc_layer_type "
            f"({a_pos} != {v_pos})"
        )
        # the AV encoders (tailored/conventional) receive pos_emb FROM the
        # embeds, so the attention/pos-enc pairing must be validated here
        # (mirrors BranchformerEncoder's own check): a rel attention with an
        # abs embed table would crash deep inside with a shape error
        att_type = str(encoder_conf.get("attention_layer_type", "rel_selfattn"))
        rel_att = att_type.endswith("rel_selfattn")
        rel_pos = a_pos in ("rel_pos", "legacy_rel_pos")
        if rel_att != rel_pos:
            raise ValueError(
                f"encoder attention_layer_type {att_type!r} is incompatible "
                f"with embed pos_enc_layer_type {a_pos!r} (relative attention "
                "needs a relative table and vice versa)"
            )
        acoustic_embed = DefaultEmbeddingLayerForAVSR(
            **filter_conf(
                DefaultEmbeddingLayerForAVSR,
                a_embed_conf,
                output_size=output_size,
                input_layer=a_embed_conf.get("input_layer", "conv2d"),
            )
        )
        visual_embed = DefaultEmbeddingLayerForAVSR(
            **filter_conf(
                DefaultEmbeddingLayerForAVSR,
                v_embed_conf,
                output_size=output_size,
                input_layer=v_embed_conf.get("input_layer", "linear"),
            )
        )

        encoder_name = getattr(config, "encoder", "tailored")
        if encoder_name == "tailored":
            encoder = TailoredEncoder(**filter_conf(TailoredEncoder, encoder_conf))
        elif encoder_name == "conventional":
            encoder = ConventionalEncoder(
                **filter_conf(ConventionalEncoder, encoder_conf)
            )
        else:
            raise ValueError(f"unknown AVSR encoder: {encoder_name}")

        fusion_name = getattr(config, "audiovisual_fusion", "adaptive")
        if fusion_name != "adaptive":
            raise ValueError(f"unknown audiovisual_fusion: {fusion_name}")
        fusion = AdaptiveAudioVisualFusion(
            **filter_conf(
                AdaptiveAudioVisualFusion,
                getattr(config, "audiovisual_fusion_conf", {}),
                output_size=output_size,
            )
        )

        is_maskctc = model_name == "maskctc"
        ctc_weight = float(model_conf.get("ctc_weight", 0.5))
        joint_network = prediction_network = None
        decoder = None
        if decoder_name_is_transducer(getattr(config, "decoder", "")):
            joint_network, prediction_network = build_transducer_modules(
                config, vocab_size, output_size
            )
        elif ctc_weight < 1.0:
            decoder_name = getattr(config, "decoder", "transformer") or "transformer"
            if is_maskctc:
                # Mask-CTC needs the non-causal MLM variant of the decoder
                decoder_name = {
                    "transformer": "mlm",
                    "sim_t": "sim_t_mlm",
                    "simt": "sim_t_mlm",
                }.get(decoder_name, decoder_name)
            decoder = build_decoder(
                decoder_name,
                getattr(config, "decoder_conf", {}),
                vocab_size + 1 if is_maskctc else vocab_size,
                output_size,
            )

        ctc_conf = dict(getattr(config, "ctc_conf", {}) or {})
        check_dropped_key("ctc_conf", "ctc_type", ctc_conf.get("ctc_type", "builtin"))
        ctc = CTCHead(
            vocab_size=vocab_size,
            dropout_rate=float(ctc_conf.get("dropout_rate", 0.0)),
        )

        acoustic_preencoder = build_preencoder(
            getattr(config, "acoustic_preencoder", None),
            getattr(config, "acoustic_preencoder_conf", {}),
        )
        visual_preencoder = build_preencoder(
            getattr(config, "visual_preencoder", None),
            getattr(config, "visual_preencoder_conf", {}),
        )
        postencoder = build_postencoder(
            getattr(config, "postencoder", None),
            getattr(config, "postencoder_conf", {}),
        )
        model_cls = {"espnet": AVSRModel, "maskctc": AVSRMaskCTCModel}[model_name]
        return model_cls(
            vocab_size=vocab_size,
            encoder=encoder,
            acoustic_preencoder=acoustic_preencoder,
            visual_preencoder=visual_preencoder,
            postencoder=postencoder,
            audiovisual_fusion=fusion,
            ctc=ctc,
            acoustic_embed=acoustic_embed,
            visual_embed=visual_embed,
            decoder=decoder,
            joint_network=joint_network,
            prediction_network=prediction_network,
            transducer_multi_blank_durations=mb_durations,
            transducer_multi_blank_sigma=float(
                model_conf.get("transducer_multi_blank_sigma", 0.05)
            ),
            acoustic_frontend=acoustic_frontend,
            visual_frontend=visual_frontend,
            specaug=specaug,
            normalize=normalize,
            ctc_weight=ctc_weight,
            interctc_weight=float(model_conf.get("interctc_weight", 0.0)),
            ignore_id=int(model_conf.get("ignore_id", -1)),
            lsm_weight=float(model_conf.get("lsm_weight", 0.0)),
            length_normalized_loss=bool(model_conf.get("length_normalized_loss", False)),
        )
