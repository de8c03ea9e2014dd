"""Full-graph CI coverage of the ancestry-protocol Pallas kernels.

The fused group attend (ops/group_attend.py) and the block-RMW cache writes
(ops/cache_update.py) are TPU kernels; on CPU the decode graph normally takes
the XLA formulations, so nothing in CI would catch an integration bug in the
Pallas branches before first TPU contact. These tests force the kernels on in
interpret mode (``inference_conf fused_group_attend: true`` +
``TAVSR_FORCE_PALLAS_WRITES=1``) and run them inside a complete Speech2Text
joint CTC/attention + folded-LM beam decode — single-device and pod-batched
over the 8-virtual-device mesh (where the kernels run per data shard under
``jax.shard_map``; VERDICT round-2 items 3-5).
"""

import types

import jax
import numpy as np
import pytest

from tailored_avsr_tpu.inference import Speech2Text


def make_cfg(tmp_path, **inf):
    tok = tmp_path / "tokens.txt"
    tok.write_text("\n".join(["<blank>", "<unk>"] +
                             [chr(65 + i) for i in range(6)] + ["<sos/eos>"]))
    return types.SimpleNamespace(
        task="asr",
        token_list=str(tok),
        frontend="default",
        frontend_conf={"n_fft": 512, "win_length": 400, "hop_length": 160,
                       "n_mels": 20},
        encoder="branchformer",
        encoder_conf={"output_size": 24, "attention_heads": 4,
                      "linear_units": 32, "cgmlp_linear_units": 32,
                      "cgmlp_conv_kernel": 7, "num_blocks": 1,
                      "input_layer": "conv2d", "dropout_rate": 0.0},
        decoder="transformer",
        decoder_conf={"attention_heads": 4, "linear_units": 32,
                      "num_blocks": 1, "dropout_rate": 0.0},
        model="espnet", model_conf={"ctc_weight": 0.3},
        inference_conf=dict({"beam_size": 3, "ctc_weight": 0.3,
                             "lm_weight": 0.4, "nbest": 2}, **inf),
    )


LM_CFG = dict(lm_conf={"att_unit": 16, "head": 2, "unit": 24,
                       "layer": 2, "dropout_rate": 0.0})


def make_batch(b=2, s=640 * 6, seed=23):
    rng = np.random.RandomState(seed)
    return {
        "speech": (rng.randn(b, s) * 0.1).astype(np.float32),
        "speech_lengths": np.full((b,), s, np.int32),
        "text": np.ones((b, 4), np.int32),
        "text_lengths": np.full((b,), 4, np.int32),
    }


def test_fused_kernels_in_full_beam_graph(tmp_path, monkeypatch):
    """fused_group_attend: true runs attend_kv_anc's Pallas branch (interpret
    mode on CPU) + the Pallas cache-write kernels inside the complete beam
    decode; hypotheses and scores match the XLA formulation."""
    batch = make_batch()
    lm_cfg = types.SimpleNamespace(token_list=None, **LM_CFG)
    ref = Speech2Text(make_cfg(tmp_path), lm_config=lm_cfg)
    res_ref = ref(batch)  # traced before the env flag: XLA formulations
    monkeypatch.setenv("TAVSR_FORCE_PALLAS_WRITES", "1")
    fused = Speech2Text(make_cfg(tmp_path, fused_group_attend=True),
                        lm_config=lm_cfg)
    assert fused.fused_group_attend is True
    fused.ensure_params(batch)
    fused.variables = ref.variables
    fused.lm_variables = ref.lm_variables
    res_fused = fused(batch)
    assert [r[0] for r in res_fused] == [r[0] for r in res_ref]


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_pod_beam_decode_keeps_fused_kernels(tmp_path, monkeypatch):
    """Pod-batched decode no longer falls back to the XLA group attend: with
    the fused path forced on, the Pallas kernels run per data shard under
    shard_map and the hypotheses match single-device decoding."""
    monkeypatch.setenv("TAVSR_FORCE_PALLAS_WRITES", "1")
    batch = make_batch(b=8)
    lm_cfg = types.SimpleNamespace(token_list=None, **LM_CFG)
    single = Speech2Text(make_cfg(tmp_path, fused_group_attend=True),
                         lm_config=lm_cfg)
    res_single = single(batch)

    pod = Speech2Text(
        make_cfg(tmp_path, fused_group_attend=True, data_parallel=True),
        lm_config=lm_cfg,
    )
    assert pod.mesh is not None and pod.mesh.shape["data"] == 8
    pod.ensure_params(batch)
    from tailored_avsr_tpu.parallel.mesh import replicate

    pod.variables = replicate(
        jax.tree_util.tree_map(np.asarray, single.variables), pod.mesh
    )
    pod.lm_variables = replicate(
        jax.tree_util.tree_map(np.asarray, single.lm_variables), pod.mesh
    )
    res_pod = pod(batch)
    assert [r[0] for r in res_pod] == [r[0] for r in res_single]


def test_no_process_global_kernel_state(tmp_path):
    """Constructing/running a meshed engine must not flip any module-level
    kernel switch for later engines (round-2 global-leak regression): the
    fused/XLA choice is a per-engine constructor setting now and the old
    mutable global setter is gone."""
    from tailored_avsr_tpu.ops import attention

    assert not hasattr(attention, "set_fused_group_attend")
    before = attention._FUSED_GROUP_ATTEND
    batch = make_batch(b=8)
    pod = Speech2Text(make_cfg(tmp_path, data_parallel=True))
    pod(batch)
    assert attention._FUSED_GROUP_ATTEND == before
    # engines built after the meshed one keep the default (auto) selection
    fresh = Speech2Text(make_cfg(tmp_path))
    assert fresh.fused_group_attend is None


def test_int8_cache_full_beam_graph(tmp_path, monkeypatch):
    """cache_dtype: int8 runs the quantized group-attend kernel
    (group_attend_anc_q, interpret mode on CPU) + int8 cache-column writes
    inside the complete joint CTC/attention + folded-LM beam decode. The
    fused path must match the XLA dequantize formulation over the SAME
    quantized cache hypothesis-for-hypothesis, and — on this tiny, clean
    case — the bf16-exact baseline too (per-column int8 error ~0.4% of the
    column max does not reorder these beams)."""
    batch = make_batch()
    lm_cfg = types.SimpleNamespace(token_list=None, **LM_CFG)
    ref = Speech2Text(make_cfg(tmp_path), lm_config=lm_cfg)
    res_exact = ref(batch)
    monkeypatch.setenv("TAVSR_FORCE_PALLAS_WRITES", "1")
    q_fused = Speech2Text(
        make_cfg(tmp_path, cache_dtype="int8", fused_group_attend=True,
                 phase_widths=[0.5, 1.0]),
        lm_config=lm_cfg,
    )
    q_fused.ensure_params(batch)
    q_fused.variables = ref.variables
    q_fused.lm_variables = ref.lm_variables
    res_q_fused = q_fused(batch)
    monkeypatch.delenv("TAVSR_FORCE_PALLAS_WRITES")
    q_xla = Speech2Text(
        make_cfg(tmp_path, cache_dtype="int8", fused_group_attend=False),
        lm_config=lm_cfg,
    )
    q_xla.ensure_params(batch)
    q_xla.variables = ref.variables
    q_xla.lm_variables = ref.lm_variables
    res_q_xla = q_xla(batch)
    assert [r[0] for r in res_q_fused] == [r[0] for r in res_q_xla]
    assert [r[0] for r in res_q_fused] == [r[0] for r in res_exact]


def test_int8_cache_requires_anc_protocol(tmp_path):
    with pytest.raises(NotImplementedError, match="cache_protocol"):
        Speech2Text(make_cfg(tmp_path, cache_dtype="int8",
                             cache_protocol="append"))
    with pytest.raises(NotImplementedError, match="cache_dtype"):
        Speech2Text(make_cfg(tmp_path, cache_dtype="int4"))


def test_int8_memory_full_beam_graph(tmp_path):
    """mem_dtype: int8 quantizes the cross-attention encoder-memory K/V
    (the one per-step read phased widths can't shrink) and folds the
    per-column scales into the grouped mem attend. On this tiny, clean case
    the hypotheses match the exact baseline; combined with cache_dtype int8
    the whole bandwidth side of the beam step runs int8."""
    batch = make_batch()
    lm_cfg = types.SimpleNamespace(token_list=None, **LM_CFG)
    ref = Speech2Text(make_cfg(tmp_path), lm_config=lm_cfg)
    res_exact = ref(batch)
    q_mem = Speech2Text(make_cfg(tmp_path, mem_dtype="int8"), lm_config=lm_cfg)
    q_mem.ensure_params(batch)
    q_mem.variables = ref.variables
    q_mem.lm_variables = ref.lm_variables
    res_q_mem = q_mem(batch)
    assert [r[0] for r in res_q_mem] == [r[0] for r in res_exact]
    both = Speech2Text(
        make_cfg(tmp_path, mem_dtype="int8", cache_dtype="int8"),
        lm_config=lm_cfg,
    )
    both.ensure_params(batch)
    both.variables = ref.variables
    both.lm_variables = ref.lm_variables
    res_both = both(batch)
    assert [r[0] for r in res_both] == [r[0] for r in res_exact]


def test_int8_memory_requires_anc_protocol(tmp_path):
    with pytest.raises(NotImplementedError, match="mem_dtype"):
        Speech2Text(make_cfg(tmp_path, mem_dtype="int8",
                             cache_protocol="append"))
    with pytest.raises(NotImplementedError, match="mem_dtype"):
        Speech2Text(make_cfg(tmp_path, mem_dtype="int4"))
