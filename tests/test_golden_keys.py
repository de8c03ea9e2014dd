"""Complete translation key maps per checkpoint family (VERDICT round-1
item 4): build each flagship model from its SHIPPED config, export a
torch-style state_dict, and require EXACT set equality with the golden key
inventory transcribed from reference/espnet source (tests/golden_keys.py) —
no missing, no extra. Then strict-load a synthetic checkpoint carrying the
full golden key set (including torch-only ``num_batches_tracked`` buffers)
and require a clean round trip."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tailored_avsr_tpu.utils.torch_compat import (
    export_torch_state_dict,
    load_torch_state_dict,
)
from tests import golden_keys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_from_config(rel_path):
    from tailored_avsr_tpu.data import get_tokenizer_converter
    from tailored_avsr_tpu.tasks import ASRTask, AVSRTask
    from tailored_avsr_tpu.utils.config import load_config

    cfg = load_config(os.path.join(ROOT, rel_path))
    cfg.token_list = os.path.join(ROOT, cfg.token_list)
    _, conv = get_tokenizer_converter(cfg)
    if cfg.task == "lm":
        from tailored_avsr_tpu.tasks.lm import LMTask

        return cfg, LMTask.build_model(cfg, conv.token_list)
    cls = AVSRTask if cfg.task == "avsr" else ASRTask
    return cfg, cls.build_model(cfg, conv.token_list)


def init_variables(cfg, model):
    rng = {"params": jax.random.PRNGKey(0), "mlm": jax.random.PRNGKey(1)}
    npr = np.random.RandomState(0)
    frames = 8
    samples = frames * 640
    text = jnp.asarray(npr.randint(3, 20, (2, 6)), jnp.int32)
    tlens = jnp.full((2,), 6, jnp.int32)
    audio = jnp.asarray(npr.randn(2, samples), jnp.float32)
    alens = jnp.full((2,), samples, jnp.int32)
    video = jnp.asarray(npr.randn(2, frames, 88, 88), jnp.float32)
    vlens = jnp.full((2,), frames, jnp.int32)
    if cfg.task == "lm":
        args = (text, tlens)
    elif cfg.task == "avsr":
        args = (audio, alens, video, vlens, text, tlens)
    elif cfg.task == "vsr":
        args = (video, vlens, text, tlens)
    else:
        args = (audio, alens, text, tlens)
    return model.init(rng, *args)


def check_family(config_path, golden):
    cfg, model = build_from_config(config_path)
    variables = init_variables(cfg, model)
    sd = export_torch_state_dict(variables)
    got = set(sd)
    want_flax = {k for k in golden if not k.endswith(".num_batches_tracked")}
    missing = sorted(want_flax - got)
    extra = sorted(got - want_flax)
    assert not missing and not extra, (
        f"{config_path}: missing={missing[:8]} extra={extra[:8]} "
        f"(counts: {len(missing)}/{len(extra)})"
    )
    # strict round trip of a synthetic checkpoint with the FULL golden set
    synth = dict(sd)
    for k in golden - want_flax:
        synth[k] = np.asarray(0, np.int64)  # num_batches_tracked buffers
    loaded, report = load_torch_state_dict(variables, synth, strict=True)
    assert not report["missing"] and not report["unused"]
    assert sorted(report["ignored"]) == sorted(golden - want_flax)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables["params"]),
        jax.tree_util.tree_leaves_with_path(loaded["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_asr_family_key_map_complete():
    check_family(
        "configs/ASR/branchformer_transformer+ctc_spanish.yaml",
        golden_keys.asr_branchformer_keys(num_blocks=12, dec_blocks=6),
    )


def test_vsr_family_key_map_complete():
    check_family(
        "configs/VSR/conv3dresnet18_branchformer_transformer+ctc_spanish.yaml",
        golden_keys.vsr_branchformer_keys(num_blocks=12, dec_blocks=6),
    )


def test_avsr_tailored_family_key_map_complete():
    # per-layer branch choices from the shipped flagship config (ref
    # configs/AVSR/tailored_transformer+ctc_spanish.yaml:79-80)
    from tailored_avsr_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(ROOT, "configs/AVSR/tailored_transformer+ctc_spanish.yaml")
    )
    aa = list(cfg.encoder_conf["acoustic_use_attn"])
    va = list(cfg.encoder_conf["visual_use_attn"])
    check_family(
        "configs/AVSR/tailored_transformer+ctc_spanish.yaml",
        golden_keys.avsr_tailored_keys(aa, va, dec_blocks=6),
    )


def test_lm_family_key_map_complete():
    check_family(
        "configs/LM/lm-spanish.yaml",
        golden_keys.lm_keys(layers=16),
    )


def test_transducer_family_key_map_complete():
    check_family(
        "configs/ASR/branchformer_transducer_spanish.yaml",
        golden_keys.transducer_keys(num_blocks=12, pred_layers=1),
    )
