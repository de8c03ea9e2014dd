"""Weight-only inference quantization (reference quantize_asr_model twin)."""

import types

import numpy as np
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.utils.quantize import (
    dequantize_variables,
    is_quantized,
    quantize_variables,
)


def test_quantize_roundtrip_error_bounded():
    key = jax.random.PRNGKey(0)
    tree = {"params": {
        "dense": {"kernel": jax.random.normal(key, (64, 128)),
                  "bias": jnp.ones((128,))},
        "tiny": {"kernel": jnp.ones((2, 2))},  # below min_size: untouched
        "norm": {"scale": jnp.ones((128,))},
    }}
    q = quantize_variables(tree, "qint8", min_size=1024)
    assert is_quantized(q)
    back = dequantize_variables(q)
    w0 = np.asarray(tree["params"]["dense"]["kernel"])
    w1 = np.asarray(back["params"]["dense"]["kernel"])
    # per-channel symmetric int8: max error <= scale/2 = absmax/254
    bound = np.abs(w0).max(axis=0, keepdims=True) / 254 + 1e-7
    assert (np.abs(w0 - w1) <= bound).all()
    np.testing.assert_array_equal(
        np.asarray(back["params"]["tiny"]["kernel"]),
        np.asarray(tree["params"]["tiny"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(back["params"]["dense"]["bias"]), np.ones(128))
    # bf16 mode halves storage, keeps shapes
    qb = quantize_variables(tree, "float16", min_size=1024)
    assert qb["__quantized_leaves__"]["q"][
        "params/dense/kernel"].dtype == jnp.bfloat16


def test_speech2text_quantized_decoding(tmp_path):
    from tailored_avsr_tpu.inference import Speech2Text

    tok = tmp_path / "tokens.txt"
    tok.write_text("\n".join(["<blank>", "<unk>"] +
                              [chr(65 + i) for i in range(6)] + ["<sos/eos>"]))
    base = dict(
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
        inference_conf={"beam_size": 2, "ctc_weight": 0.3,
                        "quantize_asr_model": True, "quantize_dtype": "qint8",
                        "quantize_min_size": 64},
    )
    rng = np.random.RandomState(0)
    B, S = 2, 640 * 6
    batch = {
        "speech": (rng.randn(B, S) * 0.1).astype(np.float32),
        "speech_lengths": np.full((B,), S, np.int32),
        "text": np.ones((B, 4), np.int32),
        "text_lengths": np.full((B,), 4, np.int32),
    }
    s2t = Speech2Text(types.SimpleNamespace(**base))
    res = s2t(batch)
    assert len(res) == B
    assert is_quantized(s2t.variables)
    # greedy fast path also runs on the quantized container
    texts = s2t.greedy(batch)
    assert len(texts) == B
