"""Shared helpers for the config->model task factories (registry layer).

Equivalent role to espnet's ``ClassChoices`` registries used by the reference
(/root/reference/src/tasks/asr.py:81-218, avsr.py:81-218): string keys select
component classes, ``*_conf`` dicts feed their constructors. Unknown conf keys
are dropped with a warning (the reference's espnet classes simply accept and
ignore extras via their own signatures).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Optional, Type

from tailored_avsr_tpu.ops.frontend_audio import LogMelFrontend
from tailored_avsr_tpu.ops.normalize import GlobalMVN, UtteranceMVN
from tailored_avsr_tpu.ops.specaug import SpecAug

logger = logging.getLogger(__name__)


# Schema keys the builders intentionally do not model — safe to drop ONLY at
# their reference-default values. Any other value would silently change the
# built model (e.g. a conv1d FFN asked for, a linear one built), so it raises
# instead. Mirrors the reference's own behavior: its encoders accept only
# positionwise_layer_type in {"linear", None} (ref
# src/encoder/branchformer/encoder.py:209, tailored/encoder.py:106-114).
_DROPPED_KEY_ALLOWED: Dict[str, tuple] = {
    "positionwise_layer_type": (None, "linear"),
    # builtin2 only masks torch CTCLoss nan-gradients (ref src/ctc/ctc.py:
    # 73-124); our masked log-space scan DP has no such pathology, so both
    # builtins map to the same loss. gtnctc needs the GTN package — gated.
    "ctc_type": ("builtin", "builtin2"),
}


def check_dropped_key(owner: str, key: str, value) -> None:
    allowed = _DROPPED_KEY_ALLOWED.get(key)
    if allowed is not None and value not in allowed:
        raise NotImplementedError(
            f"{owner} config key {key}={value!r} is not supported "
            f"(supported values: {allowed})"
        )


def filter_conf(cls: Type, conf: Optional[Dict[str, Any]], **extra) -> Dict[str, Any]:
    """Keep only constructor fields of a flax dataclass module; warn on drops.

    Keys with *semantic* weight (``_DROPPED_KEY_ALLOWED``) are validated
    before dropping — a non-default value raises instead of silently building
    a different model than the config asked for."""
    conf = dict(conf or {})
    conf.update(extra)
    fields = {f.name for f in dataclasses.fields(cls)}
    kept = {}
    for k, v in conf.items():
        if k in fields:
            if isinstance(v, list):
                v = tuple(v)
            kept[k] = v
        else:
            check_dropped_key(cls.__name__, k, v)
            logger.debug("dropping %s config key %r", cls.__name__, k)
    return kept


def build_frontend(name: Optional[str], conf: Optional[Dict]):
    from tailored_avsr_tpu.models.frontends import Conv3dResNet18

    if name in (None, "none"):
        return None
    if name == "default":
        return LogMelFrontend(**filter_conf(LogMelFrontend, conf))
    if name == "conv3dresnet18":
        return Conv3dResNet18(**filter_conf(Conv3dResNet18, conf))
    if name == "sliding_window":
        from tailored_avsr_tpu.ops.frontend_audio import SlidingWindowFrontend

        return SlidingWindowFrontend(**filter_conf(SlidingWindowFrontend, conf))
    if name == "fused":
        from tailored_avsr_tpu.ops.frontend_audio import FusedFrontend

        conf = dict(conf or {})
        if "frontends" in conf:
            conf["frontends"] = tuple(
                dict(f) for f in conf["frontends"]
            )
        return FusedFrontend(**filter_conf(FusedFrontend, conf))
    if name in ("s3prl", "whisper"):
        raise NotImplementedError(
            f"frontend '{name}' needs external pretrained weights, which are "
            "unavailable in this zero-egress build; use 'default' (log-mel), "
            "'sliding_window', 'fused', or 'conv3dresnet18'"
        )
    raise ValueError(f"unknown frontend: {name}")


def build_specaug(name: Optional[str], conf: Optional[Dict]):
    if name in (None, "none"):
        return None
    if name == "specaug":
        return SpecAug(**filter_conf(SpecAug, conf))
    raise ValueError(f"unknown specaug: {name}")


def build_normalize(name: Optional[str], conf: Optional[Dict], feature_size: int = 80):
    if name in (None, "none"):
        return None
    if name == "utterance_mvn":
        return UtteranceMVN(**filter_conf(UtteranceMVN, conf))
    if name == "global_mvn":
        return GlobalMVN(**filter_conf(GlobalMVN, conf, feature_size=feature_size))
    raise ValueError(f"unknown normalize: {name}")


def build_encoder(name: str, conf: Dict, vocab_size: Optional[int] = None):
    """ASR encoder registry — parity with the reference's 15 encoder choices
    (/root/reference/src/tasks/asr.py:145-166). External-pretrained-weight
    encoders are gated with explicit errors (zero-egress build)."""
    from tailored_avsr_tpu.models.branchformer import BranchformerEncoder

    conf = dict(conf or {})
    interctc = bool(conf.get("interctc_use_conditioning", False))
    vocab = vocab_size if interctc else None
    if name in ("branchformer", "e_branchformer"):
        if name == "e_branchformer":
            conf.setdefault("merge_method", "concat")
            conf.setdefault("merge_conv_kernel", 3)
        cls = BranchformerEncoder
    elif name == "conformer":
        from tailored_avsr_tpu.models.conformer import ConformerEncoder as cls
    elif name in ("transformer", "longformer"):
        from tailored_avsr_tpu.models import transformer_encoder as te

        conf.setdefault("pos_enc_layer_type", "abs_pos")
        conf.setdefault("attention_layer_type", "selfattn")
        conf.setdefault("ffn_activation_type", "relu")
        cls = te.LongformerEncoder if name == "longformer" else te.TransformerEncoder
    elif name in ("contextual_block_transformer", "contextual_block_conformer"):
        from tailored_avsr_tpu.models.contextual_block import ContextualBlockEncoder

        conf.setdefault("pos_enc_layer_type", "abs_pos")
        conf.setdefault("attention_layer_type", "selfattn")
        conf.setdefault(
            "block_layer",
            "conformer" if name.endswith("conformer") else "transformer",
        )
        cls = ContextualBlockEncoder
    elif name in ("rnn", "vgg_rnn"):
        from tailored_avsr_tpu.models.rnn_encoder import RNNEncoder

        conf.setdefault("use_vgg", name == "vgg_rnn")
        cls = RNNEncoder
    elif name in (
        "wav2vec2", "hubert", "hubert_pretrain", "torchaudiohubert", "whisper",
    ):
        raise NotImplementedError(
            f"encoder '{name}' needs external pretrained weights, which are "
            "unavailable in this zero-egress build; use branchformer/"
            "e_branchformer/conformer/transformer/longformer/"
            "contextual_block_*/rnn/vgg_rnn"
        )
    elif name == "transformer_multispkr":
        from tailored_avsr_tpu.models.transformer_encoder import (
            MultiSpeakerTransformerEncoder,
        )

        conf.setdefault("pos_enc_layer_type", "abs_pos")
        conf.setdefault("attention_layer_type", "selfattn")
        conf.setdefault("ffn_activation_type", "relu")
        cls = MultiSpeakerTransformerEncoder
    else:
        raise ValueError(f"unknown encoder: {name}")
    return cls(**filter_conf(cls, conf, vocab_size=vocab))


def build_decoder(name: str, conf: Optional[Dict], vocab_size: int, encoder_size: int):
    from tailored_avsr_tpu.models.decoder import (
        DynamicConv2DDecoder,
        DynamicConvDecoder,
        LightConv2DDecoder,
        LightConvDecoder,
        MLMDecoder,
        SimTDecoder,
        SimTMLMDecoder,
        TransformerDecoder,
    )

    table = {
        "transformer": TransformerDecoder,
        "sim_t": SimTDecoder,
        "simt": SimTDecoder,
        "mlm": MLMDecoder,
        "sim_t_mlm": SimTMLMDecoder,
        "lightweight_conv": LightConvDecoder,
        "dynamic_conv": DynamicConvDecoder,
        "lightweight_conv2d": LightConv2DDecoder,
        "dynamic_conv2d": DynamicConv2DDecoder,
    }
    if name == "rnn":
        from tailored_avsr_tpu.models.rnn_decoder import RNNDecoder

        return RNNDecoder(
            **filter_conf(
                RNNDecoder, conf, vocab_size=vocab_size,
                encoder_output_size=encoder_size,
            )
        )
    if name in ("whisper", "hugging_face_transformers"):
        raise NotImplementedError(
            f"decoder '{name}' needs external pretrained weights, which are "
            "unavailable in this zero-egress build"
        )
    if name == "s4":
        from tailored_avsr_tpu.models.s4_decoder import S4Decoder

        return S4Decoder(
            **filter_conf(
                S4Decoder, conf, vocab_size=vocab_size,
                encoder_output_size=encoder_size,
            )
        )
    if name not in table:
        raise ValueError(f"unknown decoder: {name}")
    cls = table[name]
    return cls(
        **filter_conf(
            cls, conf, vocab_size=vocab_size, encoder_output_size=encoder_size
        )
    )


def decoder_name_is_transducer(name) -> bool:
    return bool(name) and "transducer" in str(name)


def build_transducer_modules(config, vocab_size: int, encoder_size: int):
    """(joint_network, prediction_network) from espnet-style conf keys.

    decoder_conf follows espnet2 ``TransducerDecoder`` (imported at
    /root/reference/src/tasks/asr.py:20): ``rnn_type`` (lstm only — gated),
    ``num_layers``, ``hidden_size`` (embedding shares it), ``dropout``;
    joint_net_conf follows espnet2 ``JointNetwork`` (:73):
    ``joint_space_size``, ``joint_activation_type``."""
    from tailored_avsr_tpu.ops.rnnt import JointNetwork, PredictionNetwork

    jconf = dict(getattr(config, "joint_net_conf", {}) or {})
    dconf = dict(getattr(config, "decoder_conf", {}) or {})
    rnn_type = dconf.get("rnn_type", "lstm")
    if rnn_type != "lstm":
        raise NotImplementedError(
            f"decoder_conf rnn_type={rnn_type!r}: only 'lstm' prediction "
            "networks are implemented (espnet TransducerDecoder also offers "
            "'gru')"
        )
    joint_network = JointNetwork(
        vocab_size=vocab_size,
        joint_dim=int(jconf.get("joint_space_size", 320)),
        activation=str(jconf.get("joint_activation_type", "tanh")),
    )
    hidden = int(dconf.get("hidden_size", encoder_size))
    prediction_network = PredictionNetwork(
        vocab_size=vocab_size,
        # espnet embeds at hidden_size; embed_size kept as our explicit knob
        embed_dim=int(dconf.get("embed_size", hidden)),
        hidden_dim=hidden,
        num_layers=int(dconf.get("num_layers", 1)),
        dropout_rate=float(
            dconf.get("dropout", dconf.get("dropout_rate", 0.1))),
    )
    return joint_network, prediction_network


def build_preencoder(name, conf):
    if name in (None, "none", ""):
        return None
    if name == "linear":
        from tailored_avsr_tpu.models.prepostencoder import LinearProjection

        return LinearProjection(**filter_conf(LinearProjection, conf))
    raise ValueError(f"unknown preencoder: {name}")


def build_postencoder(name, conf):
    if name in (None, "none", ""):
        return None
    if name == "linear":
        from tailored_avsr_tpu.models.prepostencoder import LinearPostencoder

        return LinearPostencoder(**filter_conf(LinearPostencoder, conf))
    if name == "hugging_face_transformers":
        raise NotImplementedError(
            "postencoder 'hugging_face_transformers' needs external "
            "pretrained weights, which are unavailable in this zero-egress "
            "build; use 'linear'"
        )
    raise ValueError(f"unknown postencoder: {name}")
