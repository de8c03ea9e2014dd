"""CSV-split-driven dataset for ASR/VSR/AVSR samples.

Capability parity with /root/reference/src/datasets/avsr_dataset.py: CSV schema
``database,sampleID,nframes,wav_path,lips_path,transcription_path,...``
(splits/*.csv); audio loaded from WAV normalized to [-1, 1]; video from
``.npz['data']`` (T, 96, 96) with the VLRF 50->25 fps ``[::2]`` decimation;
transcriptions uppercased with '{'/'}' stripped; training split filtered to
``nframes <= limit``.

WAV decode uses scipy (torchaudio is not in this image); PCM and float WAVs
are normalized identically to torchaudio's ``normalize=True``.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd


def load_wav(path: str) -> np.ndarray:
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:  # first channel, like torchaudio.load default layout
        data = data[:, 0]
    return data


class AVSRDataset:
    def __init__(
        self,
        dataset_path: str,
        task: str = "avsr",
        nframes_limit: Optional[int] = None,
        is_training: bool = True,
    ):
        self.task = task
        df = pd.read_csv(dataset_path, delimiter=",")
        if is_training and nframes_limit is not None:
            df = df[df["nframes"] <= nframes_limit]
        self.samples = df.reset_index(drop=True)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> Dict:
        row = self.samples.iloc[index]
        sample = {"sample_id": row["sampleID"]}
        if self.task in ("asr", "avsr"):
            sample["audio"] = load_wav(row["wav_path"])
        if self.task in ("vsr", "avsr"):
            lips = np.load(row["lips_path"])["data"]
            if str(row["database"]).lower() == "vlrf":  # 50 fps -> 25 fps
                lips = lips[::2]
            sample["video"] = lips
        with open(row["transcription_path"], "r", encoding="utf-8") as f:
            text = f.readlines()[0].strip()
        sample["transcription"] = text.upper().replace("{", "").replace("}", "")
        return sample
