"""Data-plane and evaluation tests: tokenizer, dataset/dataloader contracts,
transforms, WER/CER + bootstrap (python vs native C++ twins)."""

import os
import subprocess

import numpy as np
import pytest

from tests.synthetic import make_synthetic_corpus
from tailored_avsr_tpu.data import (
    AVSRDataLoader,
    AVSRDataset,
    CharTokenizer,
    TokenIDConverter,
    load_token_list,
)
from tailored_avsr_tpu.data.transforms_audio import AddNoise, SpeedRate, TimeMasking
from tailored_avsr_tpu.data.transforms_video import (
    CenterCrop,
    Compose,
    HorizontalFlip,
    Normalise,
    RandomCrop,
)
from tailored_avsr_tpu.evaluation import (
    bootstrap_error_rate,
    compute_bootstrap_wer,
    edit_distance,
    error_rate,
    write_inf_file,
)

NATIVE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_synthetic_corpus(str(root))


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer()
    toks = tok.text2tokens("ABA CAD")
    assert toks == ["A", "B", "A", "<space>", "C", "A", "D"]
    assert tok.tokens2text(toks) == "ABA CAD"


def test_token_id_converter(corpus):
    _, token_path = corpus
    tl = load_token_list(token_path)
    conv = TokenIDConverter(tl)
    assert tl[0] == "<blank>" and tl[-1] == "<sos/eos>"
    ids = conv.tokens2ids(["A", "<space>", "Z"])  # Z not in list -> unk
    assert ids[0] == 3 and ids[1] == 2 and ids[2] == 1
    assert conv.ids2tokens([3]) == ["A"]


def test_dataset_and_loader(corpus):
    csv_path, token_path = corpus
    ds = AVSRDataset(csv_path, task="avsr", nframes_limit=500, is_training=True)
    assert len(ds) == 6
    s = ds[0]
    assert s["audio"].ndim == 1 and s["video"].shape[1:] == (96, 96)
    assert s["transcription"].isupper()
    tl = load_token_list(token_path)
    loader = AVSRDataLoader(
        ds, batch_size=3, task="avsr",
        video_transforms=Compose([Normalise(0.0, 250.0), CenterCrop((88, 88))]),
        tokenizer=CharTokenizer(), converter=TokenIDConverter(tl),
        is_training=True, seed=0,
    )
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["audio"].shape[0] == 3 and b["video"].shape[2:] == (88, 88)
    # audio truncated to multiples of 640 and bucket-padded
    assert all(l % 640 == 0 for l in b["audio_lengths"])
    assert b["audio"].shape[1] % (640 * 8) == 0
    assert b["video"].shape[1] % 8 == 0
    # audio samples / 640 == video frames per utterance (the alignment rule)
    np.testing.assert_array_equal(b["audio_lengths"] // 640, b["video_lengths"])
    assert b["text"].dtype == np.int32 and (b["text"] >= -1).all()


def test_loader_asr_vsr_tasks(corpus):
    csv_path, token_path = corpus
    tl = load_token_list(token_path)
    for task in ("asr", "vsr"):
        ds = AVSRDataset(csv_path, task=task)
        loader = AVSRDataLoader(
            ds, batch_size=2, task=task,
            tokenizer=CharTokenizer(), converter=TokenIDConverter(tl),
            is_training=False,
        )
        b = next(iter(loader))
        assert "speech" in b and "speech_lengths" in b


def test_audio_transforms():
    rng = np.random.RandomState(0)
    x = rng.randn(16000).astype(np.float32)
    sp = SpeedRate(rates=(0.9,), rng=np.random.RandomState(1))
    y = sp(x)
    assert abs(len(y) - int(16000 / 0.9)) < 200  # slower -> longer
    noise = rng.randn(8000).astype(np.float32)
    an = AddNoise(noise=noise, snr_target=0.0, rng=np.random.RandomState(2))
    z = an(x)
    assert z.shape == x.shape and not np.allclose(z, x)
    # snr 9999 = off
    an_off = AddNoise(noise=noise, snr_target=9999)
    np.testing.assert_array_equal(an_off(x), x)
    tm = TimeMasking(rng=np.random.RandomState(3))
    m = tm(x)
    assert m.shape == x.shape


def test_video_transforms():
    rng = np.random.RandomState(0)
    v = (rng.rand(10, 96, 96) * 250).astype(np.float32)
    out = Compose([Normalise(0.0, 250.0), RandomCrop((88, 88), rng=np.random.RandomState(1)),
                   HorizontalFlip(1.0)])(v)
    assert out.shape == (10, 88, 88)
    assert out.max() <= 1.0 + 1e-6


def test_edit_distance_and_rates():
    assert edit_distance("kitten", "sitting") == 3
    pairs = [("HELLO WORLD", "HELLO WORLD"), ("GOOD DAY", "GOOD NIGHT")]
    assert error_rate(pairs, words=True) == pytest.approx(25.0)
    wer, ci = bootstrap_error_rate(pairs, words=True, resamples=500, seed=1)
    assert 0 <= wer <= 60 and ci >= 0
    # determinism
    wer2, ci2 = bootstrap_error_rate(pairs, words=True, resamples=500, seed=1)
    assert (wer, ci) == (wer2, ci2)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(NATIVE, "libtasas.so")),
    reason="native lib not built",
)
def test_native_tasas_matches_python(tmp_path):
    pairs = [
        ("HELLO WORLD", "HELLO WORLD"),
        ("GOOD DAY", "GOOD NIGHT"),
        ("A B C", "A C"),
    ]
    inf = str(tmp_path / "test.inf")
    write_inf_file(inf, pairs)
    # CLI point estimates match python
    out = subprocess.run(
        [os.path.join(NATIVE, "tasas"), "-f", "#", "-s", " ", inf],
        capture_output=True, text=True,
    ).stdout.strip()
    assert float(out) == pytest.approx(error_rate(pairs, words=True), abs=0.01)
    out_cer = subprocess.run(
        [os.path.join(NATIVE, "tasas"), "-f", "#", inf],
        capture_output=True, text=True,
    ).stdout.strip()
    assert float(out_cer) == pytest.approx(error_rate(pairs, words=False), abs=0.01)
    # ctypes binding used by compute_bootstrap_wer
    wer, cer, ci_w, ci_c = compute_bootstrap_wer(inf, resamples=500, seed=7)
    assert 0 <= wer <= 100 and 0 <= cer <= 100
    # seeded determinism of the native bootstrap
    wer2, cer2, *_ = compute_bootstrap_wer(inf, resamples=500, seed=7)
    assert (wer, cer) == (wer2, cer2)


def test_dataloader_propagates_producer_errors(tmp_path):
    """A corrupt sample must raise in the consumer, not hang the iterator."""
    from tailored_avsr_tpu.data.dataloader import AVSRDataLoader

    class BadDataset:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i >= 2:
                raise RuntimeError("corrupt sample")
            return {"sample_id": f"s{i}",
                    "audio": np.zeros(640, np.float32),
                    "transcription": "AB"}

    class IdConv:
        token_list = ["<blank>", "A", "B", "<sos/eos>"]

        def tokens2ids(self, toks):
            return [1] * len(toks)

    class Tok:
        def text2tokens(self, text):
            return list(text)

    import pytest as _pytest

    for workers in (0, 4):  # serial and parallel-read producers
        dl = AVSRDataLoader(BadDataset(), 2, task="asr", tokenizer=Tok(),
                            converter=IdConv(), is_training=False,
                            workers=workers)
        with _pytest.raises(RuntimeError, match="corrupt sample"):
            for _ in dl:
                pass


def test_dataloader_abandoned_iterator_releases_producer(tmp_path):
    """Breaking out of the loop early must not leave the producer blocked."""
    import threading
    import time

    from tailored_avsr_tpu.data.dataloader import AVSRDataLoader

    class SlowOkDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"sample_id": f"s{i}",
                    "audio": np.zeros(640, np.float32),
                    "transcription": "A"}

    class IdConv:
        token_list = ["<blank>", "A", "<sos/eos>"]

        def tokens2ids(self, toks):
            return [1] * len(toks)

    class Tok:
        def text2tokens(self, text):
            return list(text)

    before = threading.active_count()
    dl = AVSRDataLoader(SlowOkDataset(), 1, task="asr", tokenizer=Tok(),
                        converter=IdConv(), is_training=False)
    for n, _ in enumerate(dl):
        if n == 1:
            break  # abandon with the queue mostly full
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_loader_workers_deterministic(corpus):
    """workers>1 parallelizes sample reads only — every batch (including
    RandomCrop/TimeMasking augmentation draws) must be byte-identical to the
    serial loader, across epochs."""
    csv_path, token_path = corpus
    tl = load_token_list(token_path)

    def batches(workers):
        ds = AVSRDataset(csv_path, task="avsr", is_training=True)
        rng = np.random.RandomState(7)
        loader = AVSRDataLoader(
            ds, batch_size=2, task="avsr",
            video_transforms=Compose([
                Normalise(0.0, 250.0), RandomCrop((88, 88), rng=rng),
            ]),
            tokenizer=CharTokenizer(), converter=TokenIDConverter(tl),
            is_training=True, seed=0, workers=workers,
        )
        return [b for _ in range(2) for b in loader]  # two epochs

    serial = batches(0)
    parallel = batches(4)
    assert len(serial) == len(parallel) > 0
    for bs, bp in zip(serial, parallel):
        assert bs["sample_id"] == bp["sample_id"]
        np.testing.assert_array_equal(bs["video"], bp["video"])
        np.testing.assert_array_equal(bs["audio"], bp["audio"])
        np.testing.assert_array_equal(bs["text"], bp["text"])
