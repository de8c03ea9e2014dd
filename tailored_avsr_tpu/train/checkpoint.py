"""Checkpointing: save/load, top-K parameter averaging, per-module load/freeze.

Capability parity with /root/reference/src/utils/model_checkpoint.py:
- ``save_model`` per epoch -> ``models/model_{epoch:03d}.ckpt``;
- ``average_models`` = uniform parameter mean over the top-K val-CER epochs
  (fairseq-style, ref :68-89);
- ``load_e2e`` full or per-module (frontend/encoder/decoder/ctc) with partial
  key matching (ref :6-66);
- ``freeze_mask`` per-module freezing (the reference's freeze_e2e sets
  requires_grad=False; here it is an optax mask that zeroes those updates —
  note the reference's CTC freezing is silently broken by a typo, ref :116;
  ours works);
- ``save_val_stats`` CSV (ref :133-136).

Serialization is flax msgpack (a single file per checkpoint; orbax-free so
checkpoints are trivially portable/inspectable).
"""

from __future__ import annotations

import csv
import os
from typing import Any, Dict, List, Optional, Sequence

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np


def save_model(variables: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))


def load_model(template: Dict[str, Any], path: str) -> Dict[str, Any]:
    if path.endswith((".pth", ".pt")):  # reference PyTorch checkpoints
        from tailored_avsr_tpu.utils.torch_compat import (
            load_pth,
            load_torch_state_dict,
        )

        loaded, report = load_torch_state_dict(template, load_pth(path))
        if report["missing"] or report["unused"]:
            import logging

            logging.getLogger(__name__).warning(
                "torch checkpoint translation: %d missing, %d unused keys",
                len(report["missing"]), len(report["unused"]),
            )
        return loaded
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def average_models(template: Dict[str, Any], paths: Sequence[str]) -> Dict[str, Any]:
    """Uniform parameter average over checkpoints (top-K averaging)."""
    assert paths
    acc = None
    for p in paths:
        v = load_model(template, p)
        if acc is None:
            acc = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), v)
        else:
            acc = jax.tree_util.tree_map(
                lambda a, x: a + np.asarray(x, np.float64), acc, v
            )
    k = float(len(paths))
    return jax.tree_util.tree_map(
        lambda a, t: np.asarray(a / k, np.asarray(t).dtype), acc, template
    )


MODULE_KEYS = {
    "frontend": ("frontend", "acoustic_frontend", "visual_frontend"),
    "encoder": ("encoder",),
    "decoder": ("decoder",),
    "ctc": ("ctc",),
    "fusion": ("audiovisual_fusion",),
    "embed": ("acoustic_embed", "visual_embed"),
}


def load_e2e(
    variables: Dict[str, Any],
    ckpt_path: str,
    modules: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Load a checkpoint fully, or only the named top-level modules.

    Module names follow the reference's CLI (frontend/encoder/decoder/ctc,
    plus fusion/embed for AVSR). Missing keys in the checkpoint are left at
    their current values (LRW-style partial transfer, ref :6-44).
    """
    if not modules or modules == ["entire-e2e"]:
        return load_model(variables, ckpt_path)
    loaded = load_model(variables, ckpt_path)
    out = {col: dict(tree) for col, tree in variables.items()}
    wanted = set()
    for m in modules:
        wanted.update(MODULE_KEYS.get(m, (m,)))
    for col in out:
        for key in out[col]:
            if key in wanted and key in loaded.get(col, {}):
                out[col][key] = loaded[col][key]
    return out


def freeze_mask(params: Dict[str, Any], modules: Sequence[str]):
    """Pytree of bools: True where the parameter belongs to a frozen module."""
    wanted = set()
    for m in modules or []:
        wanted.update(MODULE_KEYS.get(m, (m,)))

    def mask_for(key, subtree):
        frozen = key in wanted
        return jax.tree_util.tree_map(lambda _: frozen, subtree)

    return {k: mask_for(k, v) for k, v in params.items()}


def save_train_state(state, epoch: int, path: str) -> None:
    """Full training-state checkpoint {step, params, batch_stats, opt_state,
    epoch} for exact resume — the reference cannot resume its optimizer
    (SURVEY.md §5.4: save_optimizer unused/broken)."""
    import jax

    payload = {
        "epoch": epoch,
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))


def load_train_state(state, path: str):
    """Restore (TrainState, epoch) from a save_train_state checkpoint; the
    fresh ``state`` provides the target structure."""
    template = {
        "epoch": 0,
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    with open(path, "rb") as f:
        restored = flax.serialization.from_bytes(template, f.read())
    new_state = state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return new_state, int(restored["epoch"])


def save_val_stats(path: str, rows: List[Dict[str, float]]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if not rows:
        return
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)


def top_k_epochs(rows: List[Dict[str, float]], k: int, key: str = "cer") -> List[int]:
    """Epoch numbers of the K best (lowest) validation scores (ref avsr_main:226-229)."""
    ranked = sorted(rows, key=lambda r: r[key])
    return [int(r["epoch"]) for r in ranked[:k]]


def prune_checkpoints(
    rows: List[Dict[str, Any]], keep: int, key: str = "cer"
) -> List[str]:
    """Checkpoint retention: delete per-epoch checkpoints that are neither in
    the current top-``keep`` by validation score nor the newest epoch.

    The reference keeps every epoch's .pth on disk (ref avsr_main.py:222-230)
    — at 59 MB x hundreds of epochs that is not a production policy. Top-K
    averaging only ever needs the K best epochs, and resume needs the newest;
    everything else is dead weight. Returns the paths removed.
    """
    if keep <= 0 or len(rows) <= keep:
        return []
    latest = max(int(r["epoch"]) for r in rows)
    keep_epochs = set(top_k_epochs(rows, keep, key=key)) | {latest}
    removed = []
    for r in rows:
        p = r.get("path")
        if int(r["epoch"]) not in keep_epochs and p and os.path.exists(p):
            os.remove(p)
            removed.append(p)
    return removed
