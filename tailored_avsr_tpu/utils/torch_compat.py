"""PyTorch checkpoint translation: reference ``.pth`` state_dicts -> flax trees.

The reference publishes trained checkpoints (Zenodo record 14645603,
/root/reference/README.md:119) as torch state_dicts with espnet module paths.
This maps them onto our parameter tree (SURVEY.md §7 "hard parts": checkpoint
translation is required for WER parity without retraining).

Key mapping (flax path -> torch dotted key), by component:
- encoders: ``layer_{i}`` -> ``encoders.{i}``; embed stacks
  ``embed_conv/conv_{j}`` -> ``embed.conv.{2j}``, ``embed_conv/out`` ->
  ``embed.out.0`` (with-pos-enc) or ``embed.out`` (WOPosEnc, AVSR embeds),
  ``embed_linear``/``embed_norm`` -> ``embed.0``/``embed.1``;
- tailored: ``acoustic_norm`` -> ``acoustic_norm_mha`` | ``acoustic_norm_cgmlp``
  depending on which branch the layer carries (the reference names the norm
  after the branch; we use one name);
- conventional: ``acoustic_layer_{i}`` -> ``acoustic_encoder.encoders.{i}``;
- decoder: ``layer_{i}`` -> ``decoders.{i}``, ``embed_tok`` -> ``embed.0``;
- visual frontend: ``frontend3d_conv``/``frontend3d_bn`` -> ``frontend3D.0/1``,
  ``layer{s}_block{b}`` -> ``trunk.layer{s}.{b}`` with ``downsample_conv/bn``
  -> ``downsample.0/1``;
- LayerNorm ``scale`` -> ``weight``; BatchNorm stats -> ``running_mean/var``.

Weight layout transforms: Linear (out,in)->(in,out); Conv2d
(out,in,kh,kw)->(kh,kw,in,out); depthwise Conv1d (C,1,k)->(k,1,C); Conv3d
(out,in,kd,kh,kw)->(kd,kh,kw,in,out).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _is_lm_root(tree_root: Dict) -> bool:
    """espnet TransformerLM state_dicts live under an ``lm.`` prefix with
    embed/encoder/decoder attribute names (espnet2 ESPnetLanguageModel);
    detect an LM param tree by its root modules."""
    return "embed_tok" in tree_root and "output_layer" in tree_root


def _rename_segments(path: List[str], tree_root: Dict) -> List[str]:
    """Translate flax path segments to torch dotted-path segments."""
    # espnet decoders stack layers under 'decoders', encoders under 'encoders'
    in_decoder = bool(path) and path[0] == "decoder"
    # espnet TransducerDecoder is the model's `decoder` attribute: embed +
    # ModuleList `decoder` of single-layer LSTMs (keys decoder.decoder.{i}.*)
    in_prednet = bool(path) and path[0] == "prediction_network"
    is_lm = _is_lm_root(tree_root)
    out: List[str] = ["lm"] if is_lm else []
    i = 0
    while i < len(path):
        seg = path[i]
        m = re.fullmatch(r"layer_(\d+)", seg)
        if m and is_lm:
            out.extend(["encoder", "encoders", m.group(1)])
        elif m:
            out.extend(["decoders" if in_decoder else "encoders", m.group(1)])
        elif is_lm and seg == "embed_tok":
            out.append("embed")
        elif is_lm and seg == "in_linear":
            out.extend(["encoder", "embed", "0"])
        elif is_lm and seg == "in_norm":
            out.extend(["encoder", "embed", "1"])
        elif is_lm and seg == "after_norm":
            out.extend(["encoder", "after_norm"])
        elif is_lm and seg == "output_layer":
            out.append("decoder")
        elif seg == "prediction_network":
            out.append("decoder")
        elif in_prednet and seg == "embed_tok":
            out.append("embed")
        elif in_prednet and re.fullmatch(r"lstm_(\d+)", seg):
            out.extend(["decoder", seg.split("_")[-1]])
        elif re.fullmatch(r"acoustic_layer_(\d+)", seg):
            out.extend(["acoustic_encoder", "encoders", seg.split("_")[-1]])
        elif re.fullmatch(r"visual_layer_(\d+)", seg):
            out.extend(["visual_encoder", "encoders", seg.split("_")[-1]])
        elif seg == "acoustic_after_norm":
            out.extend(["acoustic_encoder", "after_norm"])
        elif seg == "visual_after_norm":
            out.extend(["visual_encoder", "after_norm"])
        elif seg == "embed_tok":
            out.extend(["embed", "0"])
        elif seg == "embed_linear":
            out.extend(["embed", "0"])
        elif seg == "embed_norm":
            out.extend(["embed", "1"])
        elif seg == "frontend3d_conv":
            out.extend(["frontend3D", "0"])
        elif seg == "frontend3d_bn":
            out.extend(["frontend3D", "1"])
        elif re.fullmatch(r"layer(\d)_block(\d)", seg):
            m2 = re.fullmatch(r"layer(\d)_block(\d)", seg)
            out.extend(["trunk", f"layer{m2.group(1)}", m2.group(2)])
        elif seg == "downsample_conv":
            out.extend(["downsample", "0"])
        elif seg == "downsample_bn":
            out.extend(["downsample", "1"])
        elif seg == "channel_proj1":
            out.extend(["channel_proj1", "0"])  # Sequential(Linear, GELU)
        else:
            out.append(seg)
        i += 1
    return out


def _embed_conv_fix(segs: List[str], in_avsr_embed: bool) -> List[str]:
    """embed_conv/conv_{j} -> embed.conv.{2j}; embed_conv/out -> embed.out[.0]."""
    out = []
    i = 0
    while i < len(segs):
        if segs[i] == "embed_conv":
            out.append("embed")
            nxt = segs[i + 1] if i + 1 < len(segs) else None
            if nxt and re.fullmatch(r"conv_(\d+)", nxt):
                j = int(nxt.split("_")[1])
                out.extend(["conv", str(2 * j)])
                i += 2
                continue
            if nxt == "out":
                out.extend(["out"] if in_avsr_embed else ["out", "0"])
                i += 2
                continue
            i += 1
        else:
            out.append(segs[i])
            i += 1
    return out


_LEAF_RENAME = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "embedding": "weight",
    "mean": "running_mean",
    "var": "running_var",
    "pos_bias_u": "pos_bias_u",
    "pos_bias_v": "pos_bias_v",
}


def torch_key_for(path: List[str], collection: str, params_root: Dict) -> str:
    """Full torch dotted key for a flax (collection, path) leaf."""
    *mods, leaf = path
    in_avsr_embed = bool(mods) and mods[0] in ("acoustic_embed", "visual_embed")
    # tailored branch-norm naming
    mods2 = []
    for i, seg in enumerate(mods):
        if seg in ("acoustic_norm", "visual_norm"):
            prefix = seg.split("_")[0]
            layer_tree = _subtree(params_root, mods[: i])
            kind = "mha" if f"{prefix}_attn" in (layer_tree or {}) else "cgmlp"
            mods2.append(f"{prefix}_norm_{kind}")
        else:
            mods2.append(seg)
    segs = _rename_segments(mods2, params_root)
    segs = _embed_conv_fix(segs, in_avsr_embed)
    leaf_t = _LEAF_RENAME.get(leaf, leaf)
    return ".".join(segs + [leaf_t])


def _subtree(root: Dict, path: List[str]) -> Optional[Dict]:
    node = root
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _to_flax(value: np.ndarray, flax_shape: Tuple[int, ...], leaf: str) -> np.ndarray:
    v = np.asarray(value)
    if leaf in ("scale",):
        return v
    if leaf == "kernel":
        if v.ndim == 2:  # Linear (out,in) -> (in,out)
            v = v.T
        elif v.ndim == 3:  # depthwise Conv1d (C,1,k) -> (k,1,C)
            v = v.transpose(2, 1, 0)
        elif v.ndim == 4:  # Conv2d (out,in,kh,kw) -> (kh,kw,in,out)
            v = v.transpose(2, 3, 1, 0)
        elif v.ndim == 5:  # Conv3d (out,in,kd,kh,kw) -> (kd,kh,kw,in,out)
            v = v.transpose(2, 3, 4, 1, 0)
    if v.shape != tuple(flax_shape):
        raise ValueError(f"shape mismatch: torch {v.shape} vs flax {tuple(flax_shape)}")
    return v


def _from_flax(value: np.ndarray, leaf: str) -> np.ndarray:
    """Inverse transform (for tests / exporting to torch)."""
    v = np.asarray(value)
    if leaf == "kernel":
        if v.ndim == 2:
            v = v.T
        elif v.ndim == 3:
            v = v.transpose(2, 1, 0)
        elif v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)
        elif v.ndim == 5:
            v = v.transpose(4, 3, 0, 1, 2)
    return v


_LSTM_KEY = re.compile(r"^(.*)\.(weight|bias)_(ih|hh)_l0$")
_LSTM_GATES = ("i", "f", "g", "o")  # torch row order == flax gate names


def _expand_lstm_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torch packed LSTM params -> per-gate pseudo-keys matching flax
    ``OptimizedLSTMCell`` leaves (both pack gates in i,f,g,o order). flax has
    no input-side bias, so torch's ``bias_ih + bias_hh`` (always summed in
    the LSTM equations) lands on the h-side gate biases — identical compute.
    """
    out = dict(sd)
    bases = {m.group(1) for k in sd if (m := _LSTM_KEY.match(k))}
    for base in bases:
        if (f"{base}.weight_ih_l0" not in sd
                or f"{base}.weight_hh_l0" not in sd):
            continue
        w_ih = np.asarray(out.pop(f"{base}.weight_ih_l0"))  # (4H, in)
        w_hh = np.asarray(out.pop(f"{base}.weight_hh_l0"))  # (4H, H)
        hsz = w_hh.shape[1]
        bias = np.zeros(4 * hsz, w_ih.dtype)
        for side in ("ih", "hh"):
            bk = f"{base}.bias_{side}_l0"
            if bk in out:
                bias = bias + np.asarray(out.pop(bk))
        for gi, g in enumerate(_LSTM_GATES):
            sl = slice(gi * hsz, (gi + 1) * hsz)
            out[f"{base}.i{g}.weight"] = w_ih[sl]
            out[f"{base}.h{g}.weight"] = w_hh[sl]
            out[f"{base}.h{g}.bias"] = bias[sl]
    return out


def _collapse_lstm_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Inverse of ``_expand_lstm_keys`` for export: per-gate pseudo-keys ->
    packed torch LSTM params (bias_ih exported as zeros; torch only ever
    uses the sum)."""
    out = dict(sd)
    bases = {
        k[: -len(".ii.weight")] for k in sd if k.endswith(".ii.weight")
    }
    for base in bases:
        if any(f"{base}.h{g}.weight" not in sd for g in _LSTM_GATES):
            continue
        w_ih = np.concatenate(
            [np.asarray(out.pop(f"{base}.i{g}.weight")) for g in _LSTM_GATES])
        w_hh = np.concatenate(
            [np.asarray(out.pop(f"{base}.h{g}.weight")) for g in _LSTM_GATES])
        b_hh = np.concatenate(
            [np.asarray(out.pop(f"{base}.h{g}.bias")) for g in _LSTM_GATES])
        out[f"{base}.weight_ih_l0"] = w_ih
        out[f"{base}.weight_hh_l0"] = w_hh
        out[f"{base}.bias_hh_l0"] = b_hh
        out[f"{base}.bias_ih_l0"] = np.zeros_like(b_hh)
    return out


def _walk(tree: Dict, path: List[str]):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, path + [k])
        else:
            yield path + [k], v


def load_torch_state_dict(
    variables: Dict[str, Any],
    state_dict: Dict[str, np.ndarray],
    strict: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Map a torch state_dict onto {'params', 'batch_stats'} variables.

    Returns (new_variables, report) where report lists 'missing' (flax leaves
    with no torch key) and 'unused' (torch keys never consumed).
    """
    # torch BatchNorm buffers with no flax counterpart: harmless, reported as
    # 'ignored' instead of 'unused' so strict loads of real checkpoints pass
    ignored = [k for k in state_dict if k.endswith(".num_batches_tracked")]
    state_dict = {k: v for k, v in state_dict.items() if k not in set(ignored)}
    state_dict = _expand_lstm_keys(state_dict)
    params_root = variables.get("params", {})
    used = set()
    missing = []
    new_vars: Dict[str, Any] = {}
    for collection, tree in variables.items():
        if collection not in ("params", "batch_stats"):
            new_vars[collection] = tree
            continue
        new_tree = _copy_tree(tree)
        for path, leaf_val in _walk(tree, []):
            tkey = torch_key_for(path, collection, params_root)
            if tkey in state_dict:
                arr = _to_flax(state_dict[tkey], np.shape(leaf_val), path[-1])
                _set(new_tree, path, arr.astype(np.asarray(leaf_val).dtype))
                used.add(tkey)
            else:
                missing.append("/".join([collection] + path))
        new_vars[collection] = new_tree
    unused = [k for k in state_dict if k not in used]
    report = {"missing": missing, "unused": unused, "ignored": ignored}
    if strict and (missing or unused):
        raise KeyError(f"checkpoint translation mismatch: {report}")
    return new_vars, report


def export_torch_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse: flax variables -> torch-style state_dict (for cross-checking)."""
    params_root = variables.get("params", {})
    out: Dict[str, np.ndarray] = {}
    for collection in ("params", "batch_stats"):
        for path, leaf_val in _walk(variables.get(collection, {}), []):
            tkey = torch_key_for(path, collection, params_root)
            out[tkey] = _from_flax(np.asarray(leaf_val), path[-1])
    return _collapse_lstm_keys(out)


def _copy_tree(tree):
    return {
        k: _copy_tree(v) if isinstance(v, dict) else v for k, v in tree.items()
    }


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth checkpoint to numpy (torch CPU is available)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
