"""Analysis-script tests (the reference's are broken as shipped — SURVEY §2.5;
ours must actually run)."""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.synthetic import make_synthetic_corpus  # noqa: E402
from tests.test_train_e2e import write_tiny_config  # noqa: E402


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_synthetic_corpus(str(root), n=4)


def test_study_branches(corpus, tmp_path):
    csv_path, token_path = corpus
    cfg = write_tiny_config(
        tmp_path, token_path,
        task="asr",
        frontend="default",
        encoder="branchformer",
        encoder_conf={
            "output_size": 32, "attention_heads": 4, "linear_units": 48,
            "cgmlp_linear_units": 48, "cgmlp_conv_kernel": 7, "num_blocks": 2,
            "input_layer": "conv2d", "dropout_rate": 0.0,
            "merge_method": "learned_ave",
        },
    )
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))
    import importlib

    sb = importlib.import_module("study_branches")
    out = str(tmp_path / "branches")
    sb.main(["--config-file", cfg, "--dataset", csv_path, "--output-dir", out])
    assert os.path.exists(os.path.join(out, "branch_scores.csv"))
    lines = open(os.path.join(out, "branch_scores.csv")).read().strip().split("\n")
    assert len(lines) == 3  # header + 2 layers


def test_study_adaptive_fusion(corpus, tmp_path):
    csv_path, token_path = corpus
    cfg = write_tiny_config(tmp_path, token_path)
    import importlib

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))
    saf = importlib.import_module("study_adaptive_fusion")
    out = str(tmp_path / "fusion")
    saf.main(["--config-file", cfg, "--dataset", csv_path, "--output-dir", out])
    path = os.path.join(out, "fusion_weights_none.csv")
    assert os.path.exists(path)
    assert len(open(path).read().strip().split("\n")) == 5  # header + 4 utts


def test_compute_flops(corpus, tmp_path, capsys):
    csv_path, token_path = corpus
    cfg = write_tiny_config(tmp_path, token_path)
    import importlib

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))
    cf = importlib.import_module("compute_flops")
    cf.main(["--config-file", cfg, "--seconds", "1.0"])
    out = capsys.readouterr().out
    assert "parameters:" in out and "FLOPs" in out


def test_mean_std_and_zipf(corpus, tmp_path, capsys):
    csv_path, _ = corpus
    import importlib

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))
    ms = importlib.import_module("compute_mean_std_rois")
    mean, std = ms.main(["--dataset", csv_path])
    assert 0.3 < mean < 0.7 and 0.1 < std < 0.5  # uniform [0,1) pixels
    zs = importlib.import_module("compute_zipf_law_stats")
    stats = zs.main(["--dataset", csv_path, "--output-dir", str(tmp_path)])
    assert stats["vocab_size"] >= 1 and stats["total_tokens"] >= 4
    assert os.path.exists(os.path.join(str(tmp_path), "word_freqs.csv"))


def test_average_model_cli(tmp_path):
    import importlib

    import numpy as np
    from tailored_avsr_tpu.train.checkpoint import save_model

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))
    am = importlib.import_module("average_model")
    p1, p2 = str(tmp_path / "a.ckpt"), str(tmp_path / "b.ckpt")
    save_model({"params": {"w": np.ones(3, np.float32)}}, p1)
    save_model({"params": {"w": 3 * np.ones(3, np.float32)}}, p2)
    out = str(tmp_path / "avg.ckpt")
    am.main(["--checkpoints", p1, p2, "--output", out])
    import flax.serialization

    avg = flax.serialization.msgpack_restore(open(out, "rb").read())
    np.testing.assert_allclose(avg["params"]["w"], 2 * np.ones(3))
