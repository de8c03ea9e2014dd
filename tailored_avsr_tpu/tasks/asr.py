"""ASR/VSR task factory: config -> E2E model.

Capability parity with ``ASRTask.build_model`` (/root/reference/src/tasks/
asr.py:482-619): wiring order frontend -> specaug -> normalize -> preencoder ->
encoder -> postencoder -> decoder -> ctc -> model. Component registries follow
the reference's string choices (frontend 'default'/'conv3dresnet18', encoder
'branchformer', decoder 'transformer'/'sim_t'/'mlm', model 'espnet'/'maskctc').
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from tailored_avsr_tpu.models.asr_model import ASRModel
from tailored_avsr_tpu.models.ctc import CTCHead
from tailored_avsr_tpu.models.maskctc import MaskCTCModel
from tailored_avsr_tpu.tasks.common import (
    build_transducer_modules,
    check_dropped_key,
    build_decoder,
    build_encoder,
    build_frontend,
    build_normalize,
    build_postencoder,
    build_preencoder,
    build_specaug,
    decoder_name_is_transducer,
)


class ASRTask:
    @classmethod
    def build_model(cls, config, token_list: List[str]):
        model_conf = dict(getattr(config, "model_conf", {}) or {})
        model_name = getattr(config, "model", "espnet") or "espnet"

        # multi-blank transducer: big-blank symbols <blank{d}> are inserted
        # just before the standard blank (in place, so the caller's converter
        # sees the extended vocabulary — the reference overwrites
        # args.token_list the same way, ref src/tasks/asr.py:495-502)
        mb_durations = tuple(
            int(d) for d in model_conf.get("transducer_multi_blank_durations") or ()
        )
        if mb_durations:
            sym_blank = model_conf.get("sym_blank", "<blank>")
            blank_idx = token_list.index(sym_blank)
            for dur in mb_durations:
                if f"<blank{dur}>" not in token_list:
                    token_list.insert(blank_idx, f"<blank{dur}>")
        vocab_size = len(token_list)

        frontend = build_frontend(
            getattr(config, "frontend", "default"),
            getattr(config, "frontend_conf", {}),
        )
        specaug = build_specaug(
            getattr(config, "specaug", None), getattr(config, "specaug_conf", {})
        )
        feature_size = frontend.output_size() if frontend is not None else 80
        normalize = build_normalize(
            getattr(config, "normalize", None),
            getattr(config, "normalize_conf", {}),
            feature_size,
        )

        encoder_name = getattr(config, "encoder", "branchformer")
        encoder_conf = dict(getattr(config, "encoder_conf", {}) or {})
        encoder = build_encoder(encoder_name, encoder_conf, vocab_size)
        encoder_size = encoder.output_size

        is_maskctc = model_name == "maskctc"
        decoder_name = getattr(config, "decoder", "transformer") or "transformer"
        decoder_conf = getattr(config, "decoder_conf", {})
        ctc_weight = float(model_conf.get("ctc_weight", 0.5))
        joint_network = prediction_network = None
        decoder = None
        if decoder_name_is_transducer(getattr(config, "decoder", "")):
            joint_network, prediction_network = build_transducer_modules(
                config, vocab_size, encoder_size
            )
        elif ctc_weight < 1.0:
            if is_maskctc:
                # Mask-CTC needs the non-causal MLM variant of the decoder
                decoder_name = {
                    "transformer": "mlm",
                    "sim_t": "sim_t_mlm",
                    "simt": "sim_t_mlm",
                }.get(decoder_name, decoder_name)
            decoder = build_decoder(
                decoder_name,
                decoder_conf,
                vocab_size + 1 if is_maskctc else vocab_size,
                encoder_size,
            )

        ctc_conf = dict(getattr(config, "ctc_conf", {}) or {})
        check_dropped_key("ctc_conf", "ctc_type", ctc_conf.get("ctc_type", "builtin"))
        ctc = CTCHead(
            vocab_size=vocab_size,
            dropout_rate=float(ctc_conf.get("dropout_rate", 0.0)),
        )

        preencoder = build_preencoder(
            getattr(config, "preencoder", None),
            getattr(config, "preencoder_conf", {}),
        )
        postencoder = build_postencoder(
            getattr(config, "postencoder", None),
            getattr(config, "postencoder_conf", {}),
        )
        if model_name == "pit_espnet":
            from tailored_avsr_tpu.models.pit_model import PITASRModel

            return PITASRModel(
                num_inf=int(model_conf.get("num_inf", 2)),
                num_ref=int(model_conf.get("num_ref", 2)),
                vocab_size=vocab_size,
                encoder=encoder,
                ctc=ctc,
                decoder=decoder,
                preencoder=preencoder,
                postencoder=postencoder,
                frontend=frontend,
                specaug=specaug,
                normalize=normalize,
                ctc_weight=ctc_weight,
                ignore_id=int(model_conf.get("ignore_id", -1)),
                lsm_weight=float(model_conf.get("lsm_weight", 0.0)),
                length_normalized_loss=bool(
                    model_conf.get("length_normalized_loss", False)
                ),
            )
        model_cls = {"espnet": ASRModel, "maskctc": MaskCTCModel}[model_name]
        return model_cls(
            vocab_size=vocab_size,
            transducer_multi_blank_durations=mb_durations,
            transducer_multi_blank_sigma=float(
                model_conf.get("transducer_multi_blank_sigma", 0.05)
            ),
            encoder=encoder,
            ctc=ctc,
            decoder=decoder,
            preencoder=preencoder,
            postencoder=postencoder,
            joint_network=joint_network,
            prediction_network=prediction_network,
            frontend=frontend,
            specaug=specaug,
            normalize=normalize,
            ctc_weight=ctc_weight,
            interctc_weight=float(model_conf.get("interctc_weight", 0.0)),
            ignore_id=int(model_conf.get("ignore_id", -1)),
            lsm_weight=float(model_conf.get("lsm_weight", 0.0)),
            length_normalized_loss=bool(model_conf.get("length_normalized_loss", False)),
        )
