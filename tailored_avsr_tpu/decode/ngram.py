"""N-gram LM scorer for beam-search shallow fusion.

Capability parity with espnet's ``NgramFullScorer``/``NgramPartScorer``
(registered by the reference at /root/reference/src/inference/
avsr_inference.py:33-41, weights at :249-255), without kenlm: the ARPA file is
parsed in numpy and — for the char-sized vocabularies the reference's primary
configs use — materialized as a dense conditional table
(V^(n-1) contexts x V) with Katz backoff applied at build time. Scoring a
beam step is then one jittable gather, so the n-gram rides inside the same
jitted beam-search graph as the neural LM.
"""

from __future__ import annotations

import math
import re
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

LOG10 = math.log(10.0)


def parse_arpa(path: str) -> Dict[int, Dict[Tuple[str, ...], Tuple[float, float]]]:
    """ARPA -> {order: {ngram tuple: (logprob_e, backoff_e)}} (natural log)."""
    tables: Dict[int, Dict[Tuple[str, ...], Tuple[float, float]]] = {}
    order = 0
    section = re.compile(r"\\(\d+)-grams:")
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("\\data") or line == "\\end\\":
                continue
            if line.startswith("ngram "):
                continue
            m = section.fullmatch(line)
            if m:
                order = int(m.group(1))
                tables[order] = {}
                continue
            if order == 0:
                continue
            parts = line.split("\t")
            if len(parts) < 2:
                continue
            logp = float(parts[0]) * LOG10
            toks = tuple(parts[1].split())
            backoff = float(parts[2]) * LOG10 if len(parts) > 2 else 0.0
            tables[order][toks] = (logp, backoff)
    return tables


class NgramScorer:
    """Dense-table char n-gram scorer (jittable score_step)."""

    def __init__(self, arpa_path: str, token_list: Sequence[str], order: int = 3):
        self.token_list = list(token_list)
        v = len(token_list)
        self.order = order
        tables = parse_arpa(arpa_path)
        order = min(order, max(tables) if tables else 1)
        self.order = order

        def cond_logp(context: Tuple[str, ...], w: str) -> float:
            """Backoff-resolved log P(w | context)."""
            for k in range(len(context), -1, -1):
                ctx = context[len(context) - k :]
                ng = ctx + (w,)
                tab = tables.get(k + 1, {})
                if ng in tab:
                    # accumulate backoff weights of the skipped longer contexts
                    bo = 0.0
                    for j in range(k, len(context)):
                        longer = context[len(context) - j - 1 :]
                        entry = tables.get(j + 1, {}).get(longer)
                        if entry is not None:
                            bo += entry[1]
                    return tab[ng][0] + bo
            return -20.0  # OOV floor

        n_ctx = v ** (order - 1)
        table = np.zeros((n_ctx, v), np.float32)
        # enumerate contexts (feasible for char vocabularies: 37^2 = 1369)
        def ctx_tokens(idx):
            toks = []
            for _ in range(order - 1):
                toks.append(self.token_list[idx % v])
                idx //= v
            return tuple(reversed(toks))

        for ci in range(n_ctx):
            context = ctx_tokens(ci)
            for wi, w in enumerate(self.token_list):
                table[ci, wi] = cond_logp(context, w)
        self.table = jnp.asarray(table)
        self.vocab = v

    def context_index(self, ys: jnp.ndarray, pos) -> jnp.ndarray:
        """(N, L) sos-prefixed buffers + scalar pos -> (N,) context row index."""
        n, l = ys.shape
        idx = jnp.zeros((n,), jnp.int32)
        for j in range(self.order - 1):  # most recent token is the low digit
            p = pos - 1 - j
            tok = jnp.where(
                p >= 0,
                jnp.take_along_axis(
                    ys, jnp.clip(p, 0, l - 1)[None, None].repeat(n, 0), axis=1
                ).squeeze(1),
                0,
            )
            idx = idx + tok * (self.vocab ** j)
        return idx

    def score_step(self, ys: jnp.ndarray, pos) -> jnp.ndarray:
        """(N, L), scalar pos -> (N, V) conditional log-probs (jittable)."""
        return self.table[self.context_index(ys, jnp.asarray(pos))]

    def score_step_candidates(
        self, ys: jnp.ndarray, pos, cand: jnp.ndarray
    ) -> jnp.ndarray:
        """Part-scorer variant for the label-sync beam: (N, L) sos-prefixed
        buffers + scalar pos + (N, P) pre-beam candidate ids -> (N, P)
        log P(cand | last order-1 tokens). Same numbers as ``score_step``
        gathered at ``cand`` — espnet's ``NgramPartScorer`` semantics (scores
        only the pre-beam candidates, does not participate in candidate
        selection; ref avsr_inference.py:167-178)."""
        idx = self.context_index(ys, jnp.asarray(pos))  # (N,)
        return self.table[idx[:, None], cand]

    def score_candidates(
        self, tokens: jnp.ndarray, lengths: jnp.ndarray, cand: jnp.ndarray
    ) -> jnp.ndarray:
        """Per-row variant for the time-synchronous search: (N, L) buffers
        with per-row ``lengths`` (no sos prefix) and one candidate token per
        row -> (N,) log P(cand | last order-1 tokens)."""
        n, l = tokens.shape
        idx = jnp.zeros((n,), jnp.int32)
        for j in range(self.order - 1):
            p = lengths - 1 - j  # (N,)
            tok = jnp.where(
                p >= 0,
                jnp.take_along_axis(
                    tokens, jnp.clip(p, 0, l - 1)[:, None], axis=1
                ).squeeze(1),
                0,
            )
            idx = idx + tok * (self.vocab ** j)
        return self.table[idx, cand]
