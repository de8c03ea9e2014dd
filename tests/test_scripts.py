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


def test_get_val_accs_and_val_accs_averaging(corpus, tmp_path):
    """get_val_accs.py decodes every epoch checkpoint and ranks them; the
    resulting CSV drives average_model.py --val-accs (the reference's
    avg_maskctc.py top-K-by-decoded-WER protocol)."""
    import importlib

    from tailored_avsr_tpu.data import (
        AVSRDataLoader,
        AVSRDataset,
        get_tokenizer_converter,
    )
    from tailored_avsr_tpu.inference import Speech2Text
    from tailored_avsr_tpu.train.checkpoint import save_model
    from tailored_avsr_tpu.utils import load_config

    csv_path, token_path = corpus
    cfg = write_tiny_config(tmp_path, token_path)
    config = load_config(cfg)

    # synthesize two "epoch" checkpoints with the exact variable tree the
    # inference engine builds (ensure_params on one real batch)
    tokenizer, converter = get_tokenizer_converter(config)
    ds = AVSRDataset(csv_path, task=config.task, is_training=False)
    loader = AVSRDataLoader(
        ds, 2, task=config.task,
        tokenizer=tokenizer, converter=converter, is_training=False,
    )
    s2t = Speech2Text(config)
    s2t.ensure_params(next(iter(loader)))
    exp = tmp_path / "exp" / "models"
    for e in (1, 2):
        save_model(s2t.variables, str(exp / f"model_{e:03d}.ckpt"))

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))
    gva = importlib.import_module("get_val_accs")
    out = tmp_path / "va"
    rows = gva.main([
        "--config-file", cfg,
        "--validation-dataset", csv_path,
        "--exp-dir", str(tmp_path / "exp"),
        "--output-dir", str(out),
    ])
    assert len(rows) == 2 and {r["epoch"] for r in rows} == {1, 2}
    assert os.path.exists(out / "val_accs.csv")
    assert os.path.exists(out / "inferences" / "val_001.inf")
    assert os.path.exists(out / "inferences" / "val_002.wer")

    am = importlib.import_module("average_model")
    avg_out = str(tmp_path / "avg.ckpt")
    am.main(["--val-accs", str(out / "val_accs.csv"), "--top-k", "2",
             "--output", avg_out])
    import flax.serialization
    import numpy as np

    avg = flax.serialization.msgpack_restore(open(avg_out, "rb").read())
    leaf = next(
        x for x in __import__("jax").tree_util.tree_leaves(avg)
        if hasattr(x, "dtype") and x.dtype == np.float32
    )
    ref = next(
        x for x in __import__("jax").tree_util.tree_leaves(s2t.variables)
        if hasattr(x, "dtype") and x.dtype == np.float32
    )
    np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref), rtol=1e-6)


def test_create_gif(tmp_path):
    """Branch-score GIF stitching (ref src/scripts/create_gif.py): pairs
    per-epoch ASR/VSR heatmaps side by side and writes one looping GIF."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    for d in ["asr", "vsr"]:
        os.makedirs(tmp_path / d)
        for e in [1, 2]:
            arr = (np.random.RandomState(e).rand(40, 60, 3) * 255).astype("uint8")
            Image.fromarray(arr).save(tmp_path / d / f"heatmap_epoch{e}.png")
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))
    import importlib

    cg = importlib.import_module("create_gif")
    out = str(tmp_path / "branches.gif")
    assert cg.main([str(tmp_path / "asr"), str(tmp_path / "vsr"), out]) == 0
    im = Image.open(out)
    assert im.size == (120, 40)  # two 60x40 heatmaps side by side
    assert getattr(im, "n_frames", 1) >= 2  # animated


def test_bench_tuning_resolution(tmp_path, monkeypatch):
    """bench.py picks up bench_tuning.json (tpu_day's sweep winner + probe
    verdict) as the beam-stage default, with CLI flags winning."""
    from types import SimpleNamespace

    import bench

    def cli(beam_batch=None, beam_phases="", tiny=False):
        return SimpleNamespace(
            beam_batch=beam_batch, beam_phases=beam_phases, tiny=tiny
        )

    assert bench.resolve_beam_tuning(cli(), {}) == (32, {})
    tuning = {
        "beam_batch": 64,
        "fused_group_attend": False,
        "phase_widths": [0.25, 1.0],
    }
    bb, ov = bench.resolve_beam_tuning(cli(), tuning)
    assert bb == 64
    assert ov == {"fused_group_attend": False, "phase_widths": [0.25, 1.0]}
    # explicit CLI flags win over the tuning file
    bb, ov = bench.resolve_beam_tuning(cli(beam_batch=128, beam_phases="0.5,1"), tuning)
    assert bb == 128 and ov["phase_widths"] == [0.5, 1.0]
    # tiny dress rehearsals stay tiny
    assert bench.resolve_beam_tuning(cli(tiny=True), tuning)[0] == 2
    # load_tuning: absent file -> {}, garbage -> {}, valid -> dict
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _: str(tmp_path), raising=True
    )
    assert bench.load_tuning() == {}
    (tmp_path / "bench_tuning.json").write_text("not json")
    assert bench.load_tuning() == {}
    (tmp_path / "bench_tuning.json").write_text('{"beam_batch": 64}')
    assert bench.load_tuning() == {"beam_batch": 64}
