"""Every shipped experiment config must build a model via its task factory."""

import glob
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob.glob(os.path.join(ROOT, "configs", d, "*.yaml"))
    for d in ("ASR", "VSR", "AVSR")
)
CONFIGS = [p for group in CONFIGS for p in group]


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds_model(path, monkeypatch):
    monkeypatch.chdir(ROOT)  # token_list paths are repo-relative
    from tailored_avsr_tpu.data import get_tokenizer_converter
    from tailored_avsr_tpu.tasks import ASRTask, AVSRTask
    from tailored_avsr_tpu.utils.config import load_config, security_checks

    cfg = load_config(path)
    security_checks(cfg)
    _, conv = get_tokenizer_converter(cfg)
    cls = AVSRTask if cfg.task == "avsr" else ASRTask
    import logging

    dropped = []

    class Capture(logging.Handler):
        def emit(self, rec):
            msg = rec.getMessage()
            if msg.startswith("dropping"):
                dropped.append(msg.split("'")[1])

    log = logging.getLogger("tailored_avsr_tpu.tasks.common")
    handler = Capture(level=logging.DEBUG)
    log.addHandler(handler)
    old_level = log.level
    log.setLevel(logging.DEBUG)
    try:
        model = cls.build_model(cfg, conv.token_list)
    finally:
        log.removeHandler(handler)
        log.setLevel(old_level)
    assert model.vocab_size == len(conv.token_list)
    # keys the builders drop must be known-inert: positional_dropout_rate in
    # the conventional wrapper matches the reference, whose inner encoders
    # are built with embed=None so the value never reaches a module
    # (ref src/encoder/audiovisual/conventional/encoder.py:94-95). Anything
    # else dropped is a silent schema divergence — extend
    # _DROPPED_KEY_ALLOWED (gate) instead of this list.
    assert set(dropped) <= {"positional_dropout_rate"}, dropped


LM_CONFIGS = sorted(glob.glob(os.path.join(ROOT, "configs", "LM", "*.yaml")))


@pytest.mark.parametrize(
    "path", LM_CONFIGS, ids=[os.path.basename(p) for p in LM_CONFIGS]
)
def test_lm_config_builds_model(path, monkeypatch):
    monkeypatch.chdir(ROOT)
    from tailored_avsr_tpu.data import get_tokenizer_converter
    from tailored_avsr_tpu.tasks.lm import LMTask
    from tailored_avsr_tpu.utils.config import load_config, security_checks

    cfg = load_config(path)
    security_checks(cfg)
    _, conv = get_tokenizer_converter(cfg)
    model = LMTask.build_model(cfg, conv.token_list)
    assert model.vocab_size == len(conv.token_list)


def test_semantic_config_keys_gate_loudly():
    """Schema keys the builders drop (positionwise_layer_type, ctc_type) must
    raise on non-default values instead of silently building a different
    model (ref encoder.py:209 also only accepts 'linear')."""
    import pytest

    from tailored_avsr_tpu.tasks.common import build_encoder, check_dropped_key

    conf = {"output_size": 32, "attention_heads": 2, "linear_units": 48,
            "num_blocks": 1, "cgmlp_linear_units": 48, "cgmlp_conv_kernel": 7,
            "input_layer": "linear", "positionwise_layer_type": "linear"}
    build_encoder("branchformer", conf)  # default value passes through
    with pytest.raises(NotImplementedError, match="positionwise_layer_type"):
        build_encoder("branchformer", dict(conf, positionwise_layer_type="conv1d"))
    check_dropped_key("ctc_conf", "ctc_type", "builtin2")  # torch-only distinction
    with pytest.raises(NotImplementedError, match="ctc_type"):
        check_dropped_key("ctc_conf", "ctc_type", "gtnctc")


def test_inference_conf_unknown_and_reference_keys(tmp_path):
    """The reference splats inference_conf as kwargs, so unknown keys fail
    loudly there (utils/inference.py:9-23); ours must too — and reference
    spellings must map (time_sync), agree with top-level keys (dtype), or
    gate loudly (streaming / ngram_scorer: part)."""
    import pytest

    from tailored_avsr_tpu.inference import Speech2Text
    from test_fused_beam_ci import make_cfg

    with pytest.raises(ValueError, match="unknown inference_conf"):
        Speech2Text(make_cfg(tmp_path, beam_sze=3))  # typo'd key
    # reference keys with defaulted values pass through untouched
    s2t = Speech2Text(make_cfg(
        tmp_path, batch_size=1, device="cuda", streaming=False,
        ngram_scorer="full", quantize_modules=["Linear"], time_sync=False,
    ))
    assert s2t.decode_mode == "label_sync"
    s2t = Speech2Text(make_cfg(tmp_path, time_sync=True))
    assert s2t.decode_mode == "timesync"
    with pytest.raises(ValueError, match="time_sync"):
        Speech2Text(make_cfg(tmp_path, time_sync=True,
                             decode_mode="label_sync"))
    with pytest.raises(ValueError, match="dtype"):
        Speech2Text(make_cfg(tmp_path, dtype="bfloat16"))
    with pytest.raises(NotImplementedError, match="streaming"):
        Speech2Text(make_cfg(tmp_path, streaming=True))
    s2t = Speech2Text(make_cfg(tmp_path, ngram_scorer="part"))
    assert s2t.ngram_mode == "part"
    with pytest.raises(ValueError, match="ngram_scorer"):
        Speech2Text(make_cfg(tmp_path, ngram_scorer="both"))
    with pytest.raises(NotImplementedError, match="transducer_conf"):
        Speech2Text(make_cfg(tmp_path, transducer_conf={"search_type": "tsd"}))


def test_cache_protocol_gates_loudly(tmp_path):
    """An unknown beam cache_protocol must raise at engine construction, not
    silently decode with the default protocol."""
    import pytest

    from tailored_avsr_tpu.inference import Speech2Text
    from test_fused_beam_ci import make_cfg

    with pytest.raises(ValueError, match="cache_protocol"):
        Speech2Text(make_cfg(tmp_path, cache_protocol="bogus"))
