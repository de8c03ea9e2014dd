"""Training-utility tests: Noam schedule, checkpoint save/load/average,
per-module load + freeze masks, config overrides, data-parallel mesh step,
LM CLI."""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tailored_avsr_tpu.train import (
    average_models,
    freeze_mask,
    load_e2e,
    load_model,
    noam_schedule,
    save_model,
    set_optimizer,
)
from tailored_avsr_tpu.utils.config import load_config, override_yaml, security_checks


def test_noam_schedule_matches_reference_formula():
    sched = noam_schedule(model_size=256, factor=1.6, warmup=10000)
    for step in (0, 99, 9999, 99999):
        s = step + 1
        want = 1.6 * 256 ** -0.5 * min(s ** -0.5, s * 10000 ** -1.5)
        np.testing.assert_allclose(float(sched(step)), want, rtol=1e-6)
    # warmup peak at step == warmup
    peak = float(sched(9999))
    assert float(sched(5000)) < peak and float(sched(50000)) < peak


def test_checkpoint_save_load_average(tmp_path):
    t1 = {"params": {"a": np.ones((2, 2), np.float32), "b": np.zeros((3,), np.float32)}}
    t2 = {"params": {"a": 3 * np.ones((2, 2), np.float32), "b": 2 * np.ones((3,), np.float32)}}
    p1, p2 = str(tmp_path / "1.ckpt"), str(tmp_path / "2.ckpt")
    save_model(t1, p1)
    save_model(t2, p2)
    loaded = load_model(t1, p1)
    np.testing.assert_array_equal(loaded["params"]["a"], t1["params"]["a"])
    avg = average_models(t1, [p1, p2])
    np.testing.assert_allclose(avg["params"]["a"], 2 * np.ones((2, 2)))
    np.testing.assert_allclose(avg["params"]["b"], np.ones((3,)))


def test_load_e2e_per_module(tmp_path):
    v = {
        "params": {
            "encoder": {"w": np.ones(2, np.float32)},
            "decoder": {"w": np.ones(2, np.float32)},
            "ctc": {"w": np.ones(2, np.float32)},
        }
    }
    ckpt = {
        "params": {
            "encoder": {"w": 5 * np.ones(2, np.float32)},
            "decoder": {"w": 7 * np.ones(2, np.float32)},
            "ctc": {"w": 9 * np.ones(2, np.float32)},
        }
    }
    path = str(tmp_path / "c.ckpt")
    save_model(ckpt, path)
    out = load_e2e(v, path, ["encoder"])
    np.testing.assert_array_equal(out["params"]["encoder"]["w"], 5 * np.ones(2))
    np.testing.assert_array_equal(out["params"]["decoder"]["w"], np.ones(2))
    out_all = load_e2e(v, path, ["entire-e2e"])
    np.testing.assert_array_equal(out_all["params"]["ctc"]["w"], 9 * np.ones(2))


def test_freeze_mask_zeroes_updates():
    params = {
        "encoder": {"w": jnp.ones(3)},
        "decoder": {"w": jnp.ones(3)},
    }
    mask = freeze_mask(params, ["encoder"])
    assert mask["encoder"]["w"] is True or bool(mask["encoder"]["w"])
    ts = {"optimizer": "adam", "scheduler": "constant", "learning_rate": 0.1,
          "accum_grad": 1, "epochs": 1}
    tx, _ = set_optimizer(ts, model_size=8, steps_per_epoch=10, frozen_mask=mask)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    np.testing.assert_allclose(np.asarray(updates["encoder"]["w"]), 0.0)
    assert float(jnp.abs(updates["decoder"]["w"]).sum()) > 0


def test_config_overrides(tmp_path):
    import yaml

    cfg = {"training_settings": {"epochs": 10, "average_epochs": 2, "learning_rate": 1e-3},
           "model_conf": {"ctc_weight": 0.1}, "task": "avsr"}
    path = str(tmp_path / "c.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    c = load_config(path, ["training_settings:epochs:20", "model_conf:ctc_weight:0.3",
                          "task:asr"])
    assert c.training_settings["epochs"] == 20  # int preserved
    assert c.model_conf["ctc_weight"] == 0.3
    assert c.task == "asr"
    security_checks(c)
    c.training_settings["average_epochs"] = 99
    with pytest.raises(AssertionError):
        security_checks(c)


def test_data_parallel_mesh_step():
    """Data-parallel train step over the 8-device CPU mesh: grads all-reduce
    and the sharded-batch loss matches the single-device loss."""
    from tailored_avsr_tpu.parallel import make_mesh, replicate, shard_batch

    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}

    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(x)

    model = Tiny()
    x = jnp.arange(64, dtype=jnp.float32).reshape(16, 4) / 64.0
    y = jnp.ones((16, 4))
    params = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(params, x, y):
        return jnp.mean((model.apply(params, x) - y) ** 2)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, x, y)

    with mesh:
        px = shard_batch(x, mesh)
        py = shard_batch(y, mesh)
        pp = replicate(params, mesh)
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(pp, px, py)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads), jax.tree_util.tree_leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)


def test_lm_main_cli(tmp_path):
    import yaml
    import lm_main

    text_path = str(tmp_path / "text.txt")
    with open(text_path, "w") as f:
        f.write("ABA CAD\nBIG DIG\nFACE HID\n")
    token_path = str(tmp_path / "tokens.txt")
    toks = ["<blank>", "<unk>", "<space>"] + list("ABCDEFGHI") + ["<sos/eos>"]
    with open(token_path, "w") as f:
        f.write("\n".join(toks) + "\n")
    cfg = {
        "task": "lm",
        "lm_conf": {"att_unit": 16, "head": 2, "unit": 24, "layer": 1,
                    "dropout_rate": 0.0},
        "token_type": "char",
        "token_list": token_path,
        "training_settings": {"optimizer": "adam", "scheduler": "noam",
                              "batch_size": 2, "warmup_steps": 10,
                              "learning_rate": 1e-3, "noam_factor": 1.0,
                              "accum_grad": 1, "epochs": 2, "average_epochs": 2},
    }
    cfg_path = str(tmp_path / "lm.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out = str(tmp_path / "exp")
    lm_main.main([
        "--config-file", cfg_path,
        "--training-dataset", text_path,
        "--output-dir", out,
    ])
    assert os.path.exists(os.path.join(out, "models", "model_average.ckpt"))

    # from_dataset_partition mode (ref src/utils/lm_dataloader.py:11:
    # ".csv" in path): a split CSV whose transcription_path files hold the
    # text — the shipped splits/ manifests can feed LM training directly
    import pandas as pd

    texts = ["ABA CAD", "BIG DIG", "FACE HID"]
    tdir = tmp_path / "trans"
    tdir.mkdir()
    rows = []
    for i, t in enumerate(texts):
        tp = tdir / f"utt{i}.txt"
        tp.write_text(t.lower() + "\nsecond line ignored\n")
        rows.append({"database": "LIP-RTVE", "sampleID": f"utt{i}",
                     "nframes": 10, "wav_path": "x.wav", "lips_path": "x.npz",
                     "transcription_path": str(tp)})
    csv_path = str(tmp_path / "split.csv")
    pd.DataFrame(rows).to_csv(csv_path)
    from tailored_avsr_tpu.data import get_tokenizer_converter
    from tailored_avsr_tpu.utils import load_config

    tokenizer, converter = get_tokenizer_converter(load_config(cfg_path))
    ds_csv = lm_main.LMTextDataset(csv_path, tokenizer, converter)
    ds_txt = lm_main.LMTextDataset(text_path, tokenizer, converter)
    assert len(ds_csv) == len(ds_txt) == 3
    for a, b in zip(ds_csv.ids, ds_txt.ids):
        np.testing.assert_array_equal(a, b)
    out2 = str(tmp_path / "exp_csv")
    lm_main.main([
        "--config-file", cfg_path,
        "--training-dataset", csv_path,
        "--output-dir", out2,
    ])
    assert os.path.exists(os.path.join(out2, "models", "model_average.ckpt"))


def test_host_sharded_global_batch():
    """Per-process local batch -> global batch-sharded arrays (single-process
    degenerate case on the 8-device CPU mesh)."""
    from tailored_avsr_tpu.parallel import (
        global_batch_from_local,
        make_mesh,
        process_batch_slice,
    )

    mesh = make_mesh(8)
    assert process_batch_slice(16) == slice(0, 16)  # single process owns all
    local = {
        "speech": np.arange(16 * 4, dtype=np.float32).reshape(16, 4),
        "speech_lengths": np.full((16,), 4, np.int32),
        "refs": ["x"] * 16,
    }
    g = global_batch_from_local(local, mesh)
    assert g["speech"].shape == (16, 4)
    assert len(g["speech"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g["speech"]), local["speech"])
    assert g["refs"] == local["refs"]


def test_train_step_remat_matches_plain():
    """jax.checkpoint rematerialization changes memory, not numerics."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tailored_avsr_tpu.models.asr_model import ASRModel
    from tailored_avsr_tpu.models.branchformer import BranchformerEncoder
    from tailored_avsr_tpu.models.ctc import CTCHead
    from tailored_avsr_tpu.train.loop import (
        create_train_state, make_train_step,
    )
    import optax

    enc = BranchformerEncoder(
        output_size=16, attention_heads=2, linear_units=24,
        cgmlp_linear_units=24, cgmlp_conv_kernel=7, num_blocks=1,
        input_layer="conv2d", dropout_rate=0.0)
    model = ASRModel(vocab_size=7, encoder=enc, ctc=CTCHead(7), ctc_weight=1.0)
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (2, 29, 12))
    flens = jnp.array([29, 21])
    text = jnp.array([[1, 2, -1], [3, -1, -1]])
    tlens = jnp.array([2, 1])
    variables = model.init(key, feats, flens, text, tlens)
    tx = optax.adam(1e-3)
    batch = (feats, flens, text, tlens)
    outs = []
    for remat in (False, True):
        state = create_train_state(variables, tx)
        step = make_train_step(model, tx, donate=False, remat=remat)
        state, stats = step(state, batch, jax.random.PRNGKey(1))
        outs.append((float(stats["loss"]),
                     np.asarray(jax.tree_util.tree_leaves(state.params)[0])))
    assert np.isfinite(outs[0][0])
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5, atol=1e-7)
