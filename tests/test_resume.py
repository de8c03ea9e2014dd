"""Training-state checkpoint/resume: exact optimizer-state round trip, and the
CLI --resume flag continues from the saved epoch."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_models import small_branchformer  # noqa: E402


def test_train_state_round_trip(tmp_path):
    from tailored_avsr_tpu.models import ASRModel, CTCHead
    from tailored_avsr_tpu.train import create_train_state, make_train_step, set_optimizer
    from tailored_avsr_tpu.train.checkpoint import load_train_state, save_train_state

    key = jax.random.PRNGKey(0)
    enc = small_branchformer(num_blocks=1)
    model = ASRModel(vocab_size=8, encoder=enc, ctc=CTCHead(8), ctc_weight=1.0)
    feats = jax.random.normal(key, (2, 45, 20))
    flens = jnp.array([45, 30])
    text = jnp.array([[1, 2, -1], [3, -1, -1]])
    tlens = jnp.array([2, 1])
    variables = model.init(key, feats, flens, text, tlens)
    ts = {"optimizer": "adam", "scheduler": "noam", "learning_rate": 1e-3,
          "warmup_steps": 10, "noam_factor": 1.0, "accum_grad": 1, "epochs": 1}
    tx, _ = set_optimizer(ts, 32, 10)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, donate=False)
    batch = (feats, flens, text, tlens)
    state, _ = step(state, batch, key)
    state, _ = step(state, batch, key)

    path = str(tmp_path / "train_state.ckpt")
    save_train_state(state, epoch=2, path=path)
    fresh = create_train_state(variables, tx)
    restored, epoch = load_train_state(fresh, path)
    assert epoch == 2 and int(restored.step) == 2
    # the next step from restored equals the next step from the live state
    next_live, stats_live = step(state, batch, key)
    next_restored, stats_restored = step(restored, batch, key)
    np.testing.assert_allclose(
        float(stats_live["loss"]), float(stats_restored["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(next_live.params),
        jax.tree_util.tree_leaves(next_restored.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_cli_resume(tmp_path):
    import yaml

    from tests.synthetic import make_synthetic_corpus
    from tests.test_train_e2e import write_tiny_config
    import avsr_main

    csv_path, token_path = make_synthetic_corpus(str(tmp_path / "corpus"), n=3)
    cfg = write_tiny_config(
        tmp_path, token_path,
        training_settings={"epochs": 2, "average_epochs": 1, "batch_size": 3},
    )
    out_dir = str(tmp_path / "exp")
    common = [
        "--config-file", cfg,
        "--training-dataset", csv_path,
        "--validation-dataset", csv_path,
        "--test-dataset", csv_path,
        "--mode", "training",
        "--output-dir", out_dir,
        "--output-name", "resume",
    ]
    avsr_main.main(common)
    assert os.path.exists(os.path.join(out_dir, "models", "train_state.ckpt"))
    # bump epochs to 3 and resume: only epoch 3 should train
    with open(cfg) as f:
        c = yaml.safe_load(f)
    c["training_settings"]["epochs"] = 3
    with open(cfg, "w") as f:
        yaml.safe_dump(c, f)
    avsr_main.main(common + ["--resume"])
    assert os.path.exists(os.path.join(out_dir, "models", "model_003.ckpt"))


def test_preemption_sigterm_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-epoch saves the full train state and exits; --resume then
    completes the run (checkpoint-on-preemption, which the reference lacks)."""
    import signal

    import avsr_main
    from tests.synthetic import make_synthetic_corpus
    from tests.test_train_e2e import write_tiny_config

    csv_path, token_path = make_synthetic_corpus(str(tmp_path / "corpus"), n=3)
    cfg = write_tiny_config(tmp_path, token_path)
    out_dir = str(tmp_path / "exp_preempt")
    handlers = {}
    real_signal = signal.signal
    real_make = avsr_main.make_train_step
    calls = {"n": 0}

    def fake_signal(sig, h):
        handlers[sig] = h

    def make(*a, **k):
        step = real_make(*a, **k)

        def wrapped(*sa):
            calls["n"] += 1
            # 1 batch/epoch (3 utts, batch_size 3): call 2 is epoch 2's step
            if calls["n"] == 2:  # "deliver" SIGTERM during the SECOND epoch
                handlers[signal.SIGTERM](signal.SIGTERM, None)
            return step(*sa)

        return wrapped

    signal.signal = fake_signal
    avsr_main.make_train_step = make
    try:
        avsr_main.main([
            "--config-file", cfg,
            "--training-dataset", csv_path,
            "--validation-dataset", csv_path,
            "--test-dataset", csv_path,
            "--mode", "training",
            "--output-dir", out_dir,
            "--output-name", "preempt",
        ])
        # epoch 1 completed -> its state is the recovery point; the partial
        # epoch 2 is abandoned (exactly-once epoch semantics)
        ts_path = os.path.join(out_dir, "models", "train_state.ckpt")
        assert os.path.exists(ts_path)
        assert os.path.exists(
            os.path.join(out_dir, "models", "model_001.ckpt")
        )
        assert not os.path.exists(
            os.path.join(out_dir, "models", "model_002.ckpt")
        )
        # preempted before finishing: no final average written
        assert not os.path.exists(
            os.path.join(out_dir, "models", "model_average.ckpt")
        )
        avsr_main.make_train_step = real_make
        avsr_main.main([
            "--config-file", cfg,
            "--training-dataset", csv_path,
            "--validation-dataset", csv_path,
            "--test-dataset", csv_path,
            "--mode", "training",
            "--output-dir", out_dir,
            "--output-name", "preempt",
            "--resume",
        ])
        assert os.path.exists(
            os.path.join(out_dir, "models", "model_average.ckpt")
        )
    finally:
        signal.signal = real_signal
        avsr_main.make_train_step = real_make


def test_preempted_mode_both_skips_inference(tmp_path):
    """--mode both preempted during training must NOT fall through to the
    inference phase (which would load the never-written model_average)."""
    import signal

    import avsr_main
    from tests.synthetic import make_synthetic_corpus
    from tests.test_train_e2e import write_tiny_config

    csv_path, token_path = make_synthetic_corpus(str(tmp_path / "corpus"), n=3)
    cfg = write_tiny_config(tmp_path, token_path)
    out_dir = str(tmp_path / "exp_both")
    handlers = {}
    real_signal = signal.signal
    real_make = avsr_main.make_train_step

    def fake_signal(sig, h):
        handlers[sig] = h

    def make(*a, **k):
        step = real_make(*a, **k)

        def wrapped(*sa):
            handlers[signal.SIGTERM](signal.SIGTERM, None)  # preempt at once
            return step(*sa)

        return wrapped

    signal.signal = fake_signal
    avsr_main.make_train_step = make
    try:
        avsr_main.main([
            "--config-file", cfg,
            "--training-dataset", csv_path,
            "--validation-dataset", csv_path,
            "--test-dataset", csv_path,
            "--mode", "both",
            "--output-dir", out_dir,
            "--output-name", "both",
        ])
    finally:
        signal.signal = real_signal
        avsr_main.make_train_step = real_make
    assert not os.path.exists(os.path.join(out_dir, "inference"))
    assert not os.path.exists(
        os.path.join(out_dir, "models", "model_average.ckpt")
    )
