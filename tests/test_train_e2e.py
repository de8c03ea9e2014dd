"""End-to-end CLI tests on the synthetic corpus: training (2 epochs, top-K
averaging) + inference (.inf/.wer outputs) through avsr_main.py — the
reference's public API (SURVEY.md §3.1/3.3)."""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.synthetic import make_synthetic_corpus  # noqa: E402


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_synthetic_corpus(str(root), n=6)


def write_tiny_config(tmp_path, token_path, **overrides):
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "tests", "avsr_tiny.yaml",
    )
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg["token_list"] = token_path
    for k, v in overrides.items():
        if isinstance(v, dict):
            cfg.setdefault(k, {}).update(v)
        else:
            cfg[k] = v
    out = str(tmp_path / "config.yaml")
    with open(out, "w") as f:
        yaml.safe_dump(cfg, f)
    return out


def test_avsr_main_train_and_infer(corpus, tmp_path):
    csv_path, token_path = corpus
    cfg = write_tiny_config(tmp_path, token_path)
    out_dir = str(tmp_path / "exp")
    import avsr_main

    avsr_main.main([
        "--config-file", cfg,
        "--training-dataset", csv_path,
        "--validation-dataset", csv_path,
        "--test-dataset", csv_path,
        "--mode", "both",
        "--output-dir", out_dir,
        "--output-name", "synthetic",
    ])
    # training artifacts
    models = os.listdir(os.path.join(out_dir, "models"))
    assert "model_001.ckpt" in models and "model_002.ckpt" in models
    assert "model_average.ckpt" in models
    assert os.path.exists(os.path.join(out_dir, "val_stats.csv"))
    # inference artifacts
    inf = os.path.join(out_dir, "inference", "synthetic.inf")
    wer = os.path.join(out_dir, "inference", "synthetic.wer")
    assert os.path.exists(inf) and os.path.exists(wer)
    lines = open(inf).read().strip().split("\n")
    assert len(lines) == 6 and all("#" in l for l in lines)
    assert "WER:" in open(wer).read()


def test_asr_main_ctc_only_greedy_slice(corpus, tmp_path):
    """The minimum end-to-end slice (SURVEY.md §7.5): audio-only branchformer
    ASR with CTC-only loss on the synthetic corpus."""
    csv_path, token_path = corpus
    cfg = write_tiny_config(
        tmp_path, token_path,
        task="asr",
        frontend="default",
        frontend_conf={"n_fft": 512, "win_length": 400, "hop_length": 160},
        encoder="branchformer",
        encoder_conf={
            "output_size": 32, "attention_heads": 4, "linear_units": 48,
            "cgmlp_linear_units": 48, "cgmlp_conv_kernel": 7, "num_blocks": 2,
            "input_layer": "conv2d", "dropout_rate": 0.1,
        },
        model_conf={"ctc_weight": 1.0},
        training_settings={"epochs": 1, "average_epochs": 1, "batch_size": 3},
    )
    out_dir = str(tmp_path / "exp_asr")
    import avsr_main

    avsr_main.main([
        "--config-file", cfg,
        "--training-dataset", csv_path,
        "--validation-dataset", csv_path,
        "--test-dataset", csv_path,
        "--mode", "training",
        "--output-dir", out_dir,
        "--output-name", "asr",
    ])
    assert os.path.exists(os.path.join(out_dir, "models", "model_average.ckpt"))


def test_maskctc_avsr_cli(corpus, tmp_path):
    """Mask-CTC model family through the full CLI (train 1 epoch + NAR infer)."""
    csv_path, token_path = corpus
    cfg = write_tiny_config(
        tmp_path, token_path,
        model="maskctc",
        model_conf={"ctc_weight": 0.3},
        inference_conf={"maskctc_n_iterations": 2,
                        "maskctc_threshold_probability": 0.99,
                        "batch_size": 2},
        training_settings={"epochs": 1, "average_epochs": 1, "batch_size": 3},
    )
    out_dir = str(tmp_path / "exp_maskctc")
    import avsr_main

    avsr_main.main([
        "--config-file", cfg,
        "--training-dataset", csv_path,
        "--validation-dataset", csv_path,
        "--test-dataset", csv_path,
        "--mode", "both",
        "--output-dir", out_dir,
        "--output-name", "maskctc",
    ])
    assert os.path.exists(os.path.join(out_dir, "inference", "maskctc.inf"))


def test_avsr_mask_robustness_inference(corpus, tmp_path):
    csv_path, token_path = corpus
    cfg = write_tiny_config(tmp_path, token_path)
    out_dir = str(tmp_path / "exp_mask")
    import avsr_main

    avsr_main.main([
        "--config-file", cfg,
        "--test-dataset", csv_path,
        "--mode", "inference",
        "--mask", "video",
        "--output-dir", out_dir,
        "--output-name", "masked",
    ])
    assert os.path.exists(os.path.join(out_dir, "inference", "masked.inf"))


def test_noise_robust_inference(corpus, tmp_path):
    """Noise-robust eval (driver config #5): the shipped pink-noise asset mixed
    at --snr-target 5 through the CLI (ref src/noise/*,
    src/transforms/audio_transforms.py:74-139)."""
    csv_path, token_path = corpus
    cfg = write_tiny_config(tmp_path, token_path)
    out_dir = str(tmp_path / "exp_noise")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    noise_path = os.path.join(root, "assets", "noise", "pink_noise.wav")
    assert os.path.exists(noise_path), "run scripts/make_noise.py"
    import avsr_main

    avsr_main.main([
        "--config-file", cfg,
        "--test-dataset", csv_path,
        "--mode", "inference",
        "--noise", noise_path,
        "--snr-target", "5",
        "--output-dir", out_dir,
        "--output-name", "noisy",
    ])
    assert os.path.exists(os.path.join(out_dir, "inference", "noisy.inf"))
    # a missing --noise path must fail loudly, not silently run clean
    with pytest.raises(FileNotFoundError):
        avsr_main.main([
            "--config-file", cfg,
            "--test-dataset", csv_path,
            "--mode", "inference",
            "--noise", str(tmp_path / "nope.wav"),
            "--output-dir", out_dir,
            "--output-name", "noisy2",
        ])


def test_nbest_inference_outputs(corpus, tmp_path):
    """inference_conf.nbest > 1 writes espnet-style nbest dirs and the 1-best
    .inf; Speech2Text.nbest returns sorted hypotheses."""
    csv_path, token_path = corpus
    cfg = write_tiny_config(
        tmp_path, token_path,
        inference_conf={"nbest": 2, "beam_size": 3, "ctc_weight": 0.3,
                        "batch_size": 3},
        training_settings={"epochs": 1, "average_epochs": 1, "batch_size": 3},
    )
    out_dir = str(tmp_path / "exp_nbest")
    import avsr_main

    avsr_main.main([
        "--config-file", cfg,
        "--training-dataset", csv_path,
        "--validation-dataset", csv_path,
        "--test-dataset", csv_path,
        "--mode", "both",
        "--output-dir", out_dir,
        "--output-name", "nb",
    ])
    assert os.path.exists(os.path.join(out_dir, "inference", "nb.inf"))
    for rank in (1, 2):
        d = os.path.join(out_dir, "inference", "nb_nbest", f"{rank}best_recog")
        text = open(os.path.join(d, "text")).read().strip().split("\n")
        score = open(os.path.join(d, "score")).read().strip().split("\n")
        assert len(text) == 6 and len(score) == 6
    # rank-1 scores >= rank-2 scores per utterance
    s1 = [float(l.split()[1]) for l in open(
        os.path.join(out_dir, "inference", "nb_nbest", "1best_recog", "score"))]
    s2 = [float(l.split()[1]) for l in open(
        os.path.join(out_dir, "inference", "nb_nbest", "2best_recog", "score"))]
    assert all(a >= b for a, b in zip(s1, s2))
