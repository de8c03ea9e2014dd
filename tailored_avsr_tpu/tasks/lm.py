"""LM task factory (reference lm_main.py + espnet LMTask equivalent)."""

from __future__ import annotations

from typing import List

from tailored_avsr_tpu.models.lm import TransformerLM
from tailored_avsr_tpu.tasks.common import filter_conf


class LMTask:
    @classmethod
    def build_model(cls, config, token_list: List[str]) -> TransformerLM:
        lm_conf = dict(getattr(config, "lm_conf", {}) or {})
        return TransformerLM(
            **filter_conf(TransformerLM, lm_conf, vocab_size=len(token_list))
        )
