"""Pod-batched (data-parallel) decoding: Speech2Text over an 8-device mesh
produces the same hypotheses as single-device decoding."""

import types

import numpy as np
import jax
import pytest

from tailored_avsr_tpu.inference import Speech2Text
from tailored_avsr_tpu.parallel.mesh import make_mesh


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
        inference_conf=dict({"beam_size": 2, "ctc_weight": 0.3}, **inf),
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_pod_decoding_matches_single_device(tmp_path):
    rng = np.random.RandomState(0)
    B, S = 8, 640 * 6  # divisible by the data axis
    batch = {
        "speech": (rng.randn(B, S) * 0.1).astype(np.float32),
        "speech_lengths": np.full((B,), S, np.int32),
        "text": np.ones((B, 4), np.int32),
        "text_lengths": np.full((B,), 4, np.int32),
    }
    single = Speech2Text(make_cfg(tmp_path))
    res_single = single(batch)
    greedy_single = single.greedy(batch)

    pod = Speech2Text(make_cfg(tmp_path, data_parallel=True))
    assert pod.mesh is not None and pod.mesh.shape["data"] == 8
    pod.ensure_params(batch)
    # same weights as the single-device engine, replicated over the mesh
    from tailored_avsr_tpu.parallel.mesh import replicate

    pod.variables = replicate(
        jax.tree_util.tree_map(np.asarray, single.variables), pod.mesh
    )
    res_pod = pod(batch)
    greedy_pod = pod.greedy(batch)
    assert [r[0] for r in res_pod] == [r[0] for r in res_single]
    assert greedy_pod == greedy_single
    # an odd batch falls back to replicated placement but still decodes
    odd = {k: v[:3] for k, v in batch.items()}
    assert len(pod(odd)) == 3
