"""CPU convergence canary: the hybrid CTC+attention AVSR flagship *path* must
demonstrably learn (VERDICT r4 item 2 — the regression gate for the learning
path).

The reference's entire reason to exist is that this loss graph trains to low
WER (/root/reference/avsr_main.py:27-58, README.md:121-125). Every module here
is golden-tested against torch twins, but a silent learning-path bug (wrong
loss weighting, dead gradients through the fusion, optimizer mis-wiring)
would only show up as "CER never leaves 100%". This test memorizes 4
synthetic utterances with the tiny tailored-AVSR hybrid model — same model
class, loss graph, optimizer, and train step as the flagship — and asserts
greedy-CTC CER collapses. Runtime is dominated by one CPU compile (~60 s);
the 600 train steps take ~10 s.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.synthetic import make_synthetic_corpus  # noqa: E402


@pytest.fixture()
def fast_host_rng():
    """Partitionable threefry (the JAX 0.9 default) lowers to a pathologically
    slow path on the virtual-device CPU backend (~4.7 s/step vs 17 ms/step
    measured on this exact workload). This canary is single-device; flip the
    flag for its 600 training steps and restore it after."""
    prev = jax.config.jax_threefry_partitionable
    jax.config.update("jax_threefry_partitionable", False)
    yield
    jax.config.update("jax_threefry_partitionable", prev)


@pytest.mark.slow
def test_hybrid_avsr_memorizes_synthetic_corpus(tmp_path, fast_host_rng):
    from tailored_avsr_tpu.data import (
        AVSRDataLoader,
        AVSRDataset,
        get_tokenizer_converter,
    )
    from tailored_avsr_tpu.decode.greedy import ctc_greedy_collapse
    from tailored_avsr_tpu.evaluation.wer import cer_from_ids
    from tailored_avsr_tpu.tasks import AVSRTask
    from tailored_avsr_tpu.train import (
        create_train_state,
        make_eval_step,
        make_train_step,
        set_optimizer,
    )
    from tailored_avsr_tpu.utils import load_config

    csv, tokens = make_synthetic_corpus(str(tmp_path / "corpus"), n=4, seed=0,
                                        nframes=12)
    cfg = load_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "tests", "avsr_tiny.yaml",
    ))
    cfg.token_list = tokens
    tokenizer, converter = get_tokenizer_converter(cfg)
    model = AVSRTask.build_model(cfg, converter.token_list)

    ds = AVSRDataset(csv, task="avsr", is_training=False)
    loader = AVSRDataLoader(ds, 4, task="avsr", tokenizer=tokenizer,
                            converter=converter, is_training=False)
    batch = next(iter(loader))
    bt = tuple(jnp.asarray(batch[k]) for k in (
        "audio", "audio_lengths", "video", "video_lengths", "text",
        "text_lengths"))

    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "mlm": rng}, *bt)

    # Noam at d=32: factor 1.0 / warmup 100 peaks near 1.8e-2 — the tuned
    # memorization operating point (measurements/r5: CER first hits 0% near
    # step 150 and repeatedly after).
    ts = {"optimizer": "adam", "scheduler": "noam", "noam_factor": 1.0,
          "warmup_steps": 100, "grad_clip": 5.0, "accum_grad": 1, "epochs": 1}
    tx, _ = set_optimizer(ts, model_size=32, steps_per_epoch=1)
    state = create_train_state(variables, tx)
    train_step = make_train_step(model, tx)
    eval_step = make_eval_step(model)

    refs = [list(t[:l]) for t, l in zip(np.asarray(bt[4]), np.asarray(bt[5]))]
    first_loss, last_loss, best_cer = None, None, 100.0
    for i in range(600):
        state, stats = train_step(state, bt, rng)
        if first_loss is None:
            first_loss = float(stats["loss"])
        last_loss = float(stats["loss"])
        if i >= 149 and (i + 1) % 25 == 0:
            out = eval_step(state, bt)
            hyp = ctc_greedy_collapse(np.asarray(out["ctc_argmax"]),
                                      np.asarray(out["ctc_argmax_lens"]))
            best_cer = min(best_cer, cer_from_ids(refs, hyp))
            if best_cer < 20.0 and last_loss < 0.5:
                break

    assert best_cer < 20.0, (
        f"hybrid AVSR failed to memorize 4 utterances: best CER {best_cer}% "
        f"(loss {first_loss:.2f} -> {last_loss:.2f}) — learning path broken"
    )
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)
