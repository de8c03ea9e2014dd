"""Full-graph golden numerics: the COMPLETE flagship tailored-AVSR model
(configs/AVSR/tailored_transformer+ctc_spanish.yaml) against the independent
torch twin (tests/torch_twins.TorchAVSRFlagship), weights flowing through the
production ``export_torch_state_dict`` translation.

This is the end-to-end composition of the per-op golden tests
(test_torch_golden.py): log-mel -> MVN -> conv2d subsample | Conv3D-ResNet18
-> align -> rel-pos -> 12 tailored layers -> adaptive fusion -> CTC, plus the
AR decoder. A drift in ANY op, any weight-layout rule, or any key-naming rule
shows up here as a numeric mismatch or a state_dict load failure.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tailored_avsr_tpu.utils.torch_compat import (  # noqa: E402
    export_torch_state_dict,
)
from tests.torch_twins import TorchAVSRFlagship  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def flagship():
    from tailored_avsr_tpu.data import get_tokenizer_converter
    from tailored_avsr_tpu.tasks import AVSRTask
    from tailored_avsr_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(ROOT, "configs/AVSR/tailored_transformer+ctc_spanish.yaml")
    )
    cfg.token_list = os.path.join(ROOT, cfg.token_list)
    _, conv = get_tokenizer_converter(cfg)
    model = AVSRTask.build_model(cfg, conv.token_list)

    b, frames = 2, 8
    samples = frames * 640
    npr = np.random.RandomState(0)
    audio = (npr.randn(b, samples) * 0.1).astype(np.float32)
    alens = np.array([samples, samples - 640], np.int32)
    video = npr.randn(b, frames, 88, 88).astype(np.float32)
    vlens = np.array([frames, frames - 1], np.int32)
    text = np.ones((b, 4), np.int32)
    tlens = np.full((b,), 4, np.int32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mlm": jax.random.PRNGKey(1)},
        jnp.asarray(audio), jnp.asarray(alens), jnp.asarray(video),
        jnp.asarray(vlens), jnp.asarray(text), jnp.asarray(tlens),
    )
    # randomize params and BN stats so layout/naming drifts can't hide behind
    # zero-initialized biases or mean-0/var-1 batch stats
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [
        leaf + 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
        if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf
        for leaf, k in zip(leaves, keys)
    ]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    # variances must stay positive after the perturbation
    def fix_var(tree):
        return {
            k: fix_var(v) if isinstance(v, dict) else (
                jnp.abs(v) + 0.1 if k == "var" else v
            )
            for k, v in tree.items()
        }
    variables = dict(variables, batch_stats=fix_var(variables["batch_stats"]))

    tw = TorchAVSRFlagship(vocab=len(conv.token_list)).eval()
    sd = export_torch_state_dict(variables)
    missing, unexpected = tw.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    # the ONLY acceptable gap: torch-side num_batches_tracked counters
    assert not unexpected, f"translation produced unknown keys: {unexpected[:5]}"
    assert all(m.endswith(".num_batches_tracked") for m in missing), [
        m for m in missing if not m.endswith(".num_batches_tracked")
    ][:5]

    batch = (audio, alens, video, vlens)
    return model, variables, tw, batch


def test_encode_matches_torch(flagship):
    model, variables, tw, (audio, alens, video, vlens) = flagship
    enc, enc_lens, _ = model.apply(
        variables, jnp.asarray(audio), jnp.asarray(alens),
        jnp.asarray(video), jnp.asarray(vlens), method="encode",
    )
    with torch.no_grad():
        want, want_lens, av_mask = tw.encode(
            torch.from_numpy(audio), torch.from_numpy(alens.astype(np.int64)),
            torch.from_numpy(video), torch.from_numpy(vlens.astype(np.int64)),
        )
    np.testing.assert_array_equal(np.asarray(enc_lens), want_lens.numpy())
    got = np.asarray(enc)
    ref = want.numpy()
    valid = av_mask.numpy()
    # compare over valid frames; 12 pre-norm layers + two frontends of fp32
    # accumulation -> per-element tolerance slightly looser than the op tests
    np.testing.assert_allclose(
        got[valid], ref[valid], rtol=2e-3, atol=2e-3
    )


def test_ctc_greedy_matches_torch(flagship):
    model, variables, tw, (audio, alens, video, vlens) = flagship
    ids, lens = model.apply(
        variables, jnp.asarray(audio), jnp.asarray(alens),
        jnp.asarray(video), jnp.asarray(vlens), method="ctc_greedy",
    )
    with torch.no_grad():
        want_ids, want_lens = tw.ctc_greedy(
            torch.from_numpy(audio), torch.from_numpy(alens.astype(np.int64)),
            torch.from_numpy(video), torch.from_numpy(vlens.astype(np.int64)),
        )
    np.testing.assert_array_equal(np.asarray(lens), want_lens.numpy())
    got = np.asarray(ids)
    ref = want_ids.numpy()
    for b in range(got.shape[0]):
        n = int(np.asarray(lens)[b])
        # argmax can legitimately flip on near-ties; require >=95% agreement
        agree = float(np.mean(got[b, :n] == ref[b, :n]))
        assert agree >= 0.95, f"utt {b}: greedy ids agree only {agree:.2%}"


def test_decoder_matches_torch(flagship):
    model, variables, tw, (audio, alens, video, vlens) = flagship
    b = audio.shape[0]
    npr = np.random.RandomState(7)
    ys = npr.randint(3, 20, (b, 5)).astype(np.int32)
    ylens = np.array([5, 4], np.int32)

    def run_dec(m, a, al, v, vl, ys_in, ys_lens):
        enc, enc_lens, _ = m.encode(a, al, v, vl)
        mask = jnp.arange(enc.shape[1])[None, :] < enc_lens[:, None]
        return m.decoder(enc, mask, ys_in, ys_lens)

    logits = model.apply(
        variables, jnp.asarray(audio), jnp.asarray(alens), jnp.asarray(video),
        jnp.asarray(vlens), jnp.asarray(ys), jnp.asarray(ylens),
        method=run_dec,
    )
    with torch.no_grad():
        want = tw.decoder_forward(
            torch.from_numpy(audio), torch.from_numpy(alens.astype(np.int64)),
            torch.from_numpy(video), torch.from_numpy(vlens.astype(np.int64)),
            torch.from_numpy(ys.astype(np.int64)),
            torch.from_numpy(ylens.astype(np.int64)),
        )
    got = np.asarray(logits)
    ref = want.numpy()
    for i in range(b):
        n = int(ylens[i])
        np.testing.assert_allclose(
            got[i, :n], ref[i, :n], rtol=2e-3, atol=2e-3
        )
