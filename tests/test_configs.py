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
    model = cls.build_model(cfg, conv.token_list)
    assert model.vocab_size == len(conv.token_list)


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
