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


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_tensor_parallel_cli_training_matches_single(tmp_path):
    """training_settings model_parallel: 2 trains the model over a
    ('data','model') mesh via the CLI — Megatron-style sharded FFN/cgMLP and
    attention projections (parallel/mesh.py tp_param_spec) — and the resulting
    parameters match single-device training numerically (the math is
    identical; only matmul reduction order differs)."""
    # TP's row-parallel psum adds one more reduction-order difference than DP,
    # so slightly more near-zero-gradient elements land outside tolerance
    _cli_train_parity(
        tmp_path,
        {"data_parallel": True, "model_parallel": 2},
        name="tp",
        bad_per_10k=3,
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_data_parallel_cli_training_matches_single(tmp_path):
    """training_settings data_parallel: true shards the batch over the mesh;
    the resulting parameters match single-device training numerically."""
    _cli_train_parity(tmp_path, {"data_parallel": True}, name="pod")


def _cli_train_parity(tmp_path, parallel_settings, name, bad_per_10k=1):
    import os

    import flax.serialization

    import avsr_main
    from tests.synthetic import make_synthetic_corpus
    from tests.test_train_e2e import write_tiny_config

    csv_path, token_path = make_synthetic_corpus(str(tmp_path / "corpus"), n=4)
    # train-time augmentations draw from unseeded per-transform RandomStates
    # (matching the reference's behavior); swap in the deterministic eval
    # transforms so both runs consume identical batches
    real_build = avsr_main.build_transforms

    def det_transforms(args):
        t = real_build(args)
        return dict(t, train_audio=t["eval_audio"], train_video=t["eval_video"])

    avsr_main.build_transforms = det_transforms
    outs = {}
    for run, extra in (("single", {}), (name, parallel_settings)):
        cfg = write_tiny_config(
            tmp_path, token_path,
            training_settings={"epochs": 1, "average_epochs": 1,
                               "batch_size": 4, **extra},
        )
        out_dir = str(tmp_path / f"exp_{run}")
        # host-side augmentations draw from the global numpy RNG: pin it so
        # both runs consume identical augmented batches
        np.random.seed(0)
        import random as _random

        _random.seed(0)
        avsr_main.main([
            "--config-file", cfg,
            "--training-dataset", csv_path,
            "--validation-dataset", csv_path,
            "--test-dataset", csv_path,
            "--mode", "training",
            "--output-dir", out_dir,
            "--output-name", run,
        ])
        ckpt = os.path.join(out_dir, "models", "model_001.ckpt")
        assert os.path.exists(ckpt)
        with open(ckpt, "rb") as f:
            outs[run] = flax.serialization.msgpack_restore(f.read())
    avsr_main.build_transforms = real_build
    a = jax.tree_util.tree_leaves(outs["single"]["params"])
    b = jax.tree_util.tree_leaves(outs[name]["params"])
    assert len(a) == len(b)
    # near-zero gradients can flip Adam's update sign under a different
    # reduction order; require agreement on all non-degenerate elements
    total = bad = 0
    for x, y in zip(a, b):
        x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
        close = np.isclose(x, y, rtol=2e-3, atol=2e-5)
        total += x.size
        bad += int((~close).sum())
    assert bad <= max(2, bad_per_10k * total // 10000), (bad, total)
