"""PyTorch checkpoint -> flax variables converter.

Maps the reference SiamMask state_dict naming (experiments/siammask_sharp/custom.py
module tree: ``features.features.*`` resnet, ``features.downsample.*`` neck,
``rpn_model.*``, ``mask_model.*``, ``refine_model.*``) onto this package's flax
module tree, transposing conv kernels (O,I,kh,kw) -> (kh,kw,I,O) and splitting
BatchNorm into params (scale/bias) + batch_stats (mean/var).

Handles the reference checkpoints' ``module.`` DataParallel prefix (see
`utils/load_helper.py:30-54`). Works from a plain {name: np.ndarray} dict so torch
is only needed by the optional ``load_torch_checkpoint`` entry point.
"""
from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


_RESNET_RE = re.compile(
    r"^features\.features\.(conv1|bn1)\.(.+)$|"
    r"^features\.features\.layer(\d)\.(\d+)\.(.+)$")


def _map_bn(flax_prefix: str, suffix: str, value, params: dict, stats: dict):
    if suffix == "weight":
        _set(params, f"{flax_prefix}.scale", value)
    elif suffix == "bias":
        _set(params, f"{flax_prefix}.bias", value)
    elif suffix == "running_mean":
        _set(stats, f"{flax_prefix}.mean", value)
    elif suffix == "running_var":
        _set(stats, f"{flax_prefix}.var", value)
    elif suffix == "num_batches_tracked":
        pass
    else:
        raise KeyError(f"unknown BN suffix {suffix}")


def _map_depthcorr(rest: str, flax_prefix: str, value, params: dict, stats: dict):
    """rest like 'conv_kernel.0.weight', 'head.3.bias'."""
    m = re.match(r"^(conv_kernel|conv_search)\.([01])\.(.+)$", rest)
    if m:
        side, idx, suffix = m.groups()
        if idx == "0":
            _set(params, f"{flax_prefix}.{side}.conv.kernel", _conv_kernel(value))
        else:
            _map_bn(f"{flax_prefix}.{side}.bn", suffix, value, params, stats)
        return
    m = re.match(r"^head\.([013])\.(.+)$", rest)
    if m:
        idx, suffix = m.groups()
        if idx == "0":
            _set(params, f"{flax_prefix}.head_conv1.conv.kernel", _conv_kernel(value))
        elif idx == "1":
            _map_bn(f"{flax_prefix}.head_conv1.bn", suffix, value, params, stats)
        else:  # head.3 — final 1x1 conv with bias
            if suffix == "weight":
                _set(params, f"{flax_prefix}.head_conv2.kernel", _conv_kernel(value))
            else:
                _set(params, f"{flax_prefix}.head_conv2.bias", value)
        return
    raise KeyError(f"unmapped DepthCorr entry: {rest}")


def convert_state_dict(state: Mapping[str, np.ndarray]) -> dict:
    """Convert a reference state_dict (numpy values) to flax variables
    {'params': ..., 'batch_stats': ...}."""
    params: dict = {}
    stats: dict = {}

    for name, value in state.items():
        if name.startswith("module."):
            name = name[len("module."):]
        value = np.asarray(value)

        # --- backbone ---
        if name.startswith("features.features."):
            rest = name[len("features.features."):]
            m = re.match(r"^(conv1|bn1)\.(.+)$", rest)
            if m:
                layer, suffix = m.groups()
                if layer == "conv1":
                    _set(params, "backbone.conv1.kernel", _conv_kernel(value))
                else:
                    _map_bn("backbone.bn1", suffix, value, params, stats)
                continue
            m = re.match(r"^layer(\d)\.(\d+)\.(.+)$", rest)
            if m:
                lnum, bnum, brest = m.groups()
                prefix = f"backbone.layer{lnum}.block{bnum}"
                m2 = re.match(r"^conv(\d)\.weight$", brest)
                if m2:
                    _set(params, f"{prefix}.conv{m2.group(1)}.kernel", _conv_kernel(value))
                    continue
                m2 = re.match(r"^bn(\d)\.(.+)$", brest)
                if m2:
                    _map_bn(f"{prefix}.bn{m2.group(1)}", m2.group(2), value, params, stats)
                    continue
                m2 = re.match(r"^downsample\.([01])\.(.+)$", brest)
                if m2:
                    if m2.group(1) == "0":
                        _set(params, f"{prefix}.downsample_conv.kernel", _conv_kernel(value))
                    else:
                        _map_bn(f"{prefix}.downsample_bn", m2.group(2), value, params, stats)
                    continue
            raise KeyError(f"unmapped backbone entry: {name}")

        # --- neck ---
        if name.startswith("features.downsample.downsample."):
            rest = name[len("features.downsample.downsample."):]
            idx, suffix = rest.split(".", 1)
            if idx == "0":
                _set(params, "neck.conv.kernel", _conv_kernel(value))
            else:
                _map_bn("neck.bn", suffix, value, params, stats)
            continue

        # --- rpn heads ---
        m = re.match(r"^rpn_model\.(cls|loc)\.(.+)$", name)
        if m:
            _map_depthcorr(m.group(2), f"rpn.{m.group(1)}", value, params, stats)
            continue

        # --- mask head ---
        if name.startswith("mask_model.mask."):
            _map_depthcorr(name[len("mask_model.mask."):], "mask_corr.mask",
                           value, params, stats)
            continue

        # --- refine ---
        m = re.match(r"^refine_model\.(v0|v1|v2|h0|h1|h2)\.([02])\.(weight|bias)$", name)
        if m:
            block, idx, suffix = m.groups()
            conv = "conv0" if idx == "0" else "conv1"
            if suffix == "weight":
                _set(params, f"refine.{block}.{conv}.kernel", _conv_kernel(value))
            else:
                _set(params, f"refine.{block}.{conv}.bias", value)
            continue
        m = re.match(r"^refine_model\.deconv\.(weight|bias)$", name)
        if m:
            # torch ConvTranspose2d weight is (in, out, kh, kw) — DeconvExpand keeps it
            key = "kernel" if m.group(1) == "weight" else "bias"
            _set(params, f"refine.deconv.{key}", value)
            continue
        m = re.match(r"^refine_model\.post([012])\.(weight|bias)$", name)
        if m:
            idx, suffix = m.groups()
            if suffix == "weight":
                _set(params, f"refine.post{idx}.kernel", _conv_kernel(value))
            else:
                _set(params, f"refine.post{idx}.bias", value)
            continue

        if name.endswith("num_batches_tracked") or name in ("anchors",):
            continue
        raise KeyError(f"unmapped checkpoint entry: {name}")

    return {"params": params, "batch_stats": stats}


def _flatten(tree: Mapping, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _inv_conv_kernel(w: np.ndarray) -> np.ndarray:
    """(kh,kw,I,O) -> (O,I,kh,kw) — inverse of _conv_kernel."""
    return np.transpose(w, (3, 2, 0, 1))


_BN_LEAF = {"scale": "weight", "bias": "bias", "mean": "running_mean",
            "var": "running_var"}


def _depthcorr_torch(rest: str) -> tuple[str, bool]:
    """Inverse of _map_depthcorr: flax sub-path under a DepthCorr module ->
    (torch sub-name, needs_conv_transpose)."""
    m = re.match(r"^(conv_kernel|conv_search)\.conv\.kernel$", rest)
    if m:
        return f"{m.group(1)}.0.weight", True
    m = re.match(r"^(conv_kernel|conv_search)\.bn\.(scale|bias|mean|var)$", rest)
    if m:
        return f"{m.group(1)}.1.{_BN_LEAF[m.group(2)]}", False
    if rest == "head_conv1.conv.kernel":
        return "head.0.weight", True
    m = re.match(r"^head_conv1\.bn\.(scale|bias|mean|var)$", rest)
    if m:
        return f"head.1.{_BN_LEAF[m.group(1)]}", False
    if rest == "head_conv2.kernel":
        return "head.3.weight", True
    if rest == "head_conv2.bias":
        return "head.3.bias", False
    raise KeyError(f"unmapped DepthCorr flax path: {rest}")


def _torch_name(path: str) -> tuple[str, bool]:
    """Flax dotted path (collection stripped) -> (reference state_dict name,
    needs_conv_transpose). Inverse of the convert_state_dict mapping."""
    # --- backbone ---
    if path == "backbone.conv1.kernel":
        return "features.features.conv1.weight", True
    m = re.match(r"^backbone\.bn1\.(scale|bias|mean|var)$", path)
    if m:
        return f"features.features.bn1.{_BN_LEAF[m.group(1)]}", False
    m = re.match(r"^backbone\.layer(\d)\.block(\d+)\.(.+)$", path)
    if m:
        lnum, bnum, rest = m.groups()
        prefix = f"features.features.layer{lnum}.{bnum}"
        m2 = re.match(r"^conv(\d)\.kernel$", rest)
        if m2:
            return f"{prefix}.conv{m2.group(1)}.weight", True
        m2 = re.match(r"^bn(\d)\.(scale|bias|mean|var)$", rest)
        if m2:
            return f"{prefix}.bn{m2.group(1)}.{_BN_LEAF[m2.group(2)]}", False
        if rest == "downsample_conv.kernel":
            return f"{prefix}.downsample.0.weight", True
        m2 = re.match(r"^downsample_bn\.(scale|bias|mean|var)$", rest)
        if m2:
            return f"{prefix}.downsample.1.{_BN_LEAF[m2.group(1)]}", False
    # --- neck ---
    if path == "neck.conv.kernel":
        return "features.downsample.downsample.0.weight", True
    m = re.match(r"^neck\.bn\.(scale|bias|mean|var)$", path)
    if m:
        return f"features.downsample.downsample.1.{_BN_LEAF[m.group(1)]}", False
    # --- rpn heads ---
    m = re.match(r"^rpn\.(cls|loc)\.(.+)$", path)
    if m:
        sub, t = _depthcorr_torch(m.group(2))
        return f"rpn_model.{m.group(1)}.{sub}", t
    # --- mask head ---
    m = re.match(r"^mask_corr\.mask\.(.+)$", path)
    if m:
        sub, t = _depthcorr_torch(m.group(1))
        return f"mask_model.mask.{sub}", t
    # --- refine ---
    m = re.match(r"^refine\.(v0|v1|v2|h0|h1|h2)\.conv([01])\.(kernel|bias)$",
                 path)
    if m:
        block, idx, leaf = m.groups()
        tidx = "0" if idx == "0" else "2"
        if leaf == "kernel":
            return f"refine_model.{block}.{tidx}.weight", True
        return f"refine_model.{block}.{tidx}.bias", False
    m = re.match(r"^refine\.deconv\.(kernel|bias)$", path)
    if m:
        # torch ConvTranspose2d weight is (in,out,kh,kw) — stored verbatim
        return ("refine_model.deconv.weight" if m.group(1) == "kernel"
                else "refine_model.deconv.bias"), False
    m = re.match(r"^refine\.post([012])\.(kernel|bias)$", path)
    if m:
        idx, leaf = m.groups()
        if leaf == "kernel":
            return f"refine_model.post{idx}.weight", True
        return f"refine_model.post{idx}.bias", False
    raise KeyError(f"unmapped flax path: {path}")


def invert_variables(variables: Mapping) -> dict:
    """Flax variables {'params', 'batch_stats'} -> reference state_dict
    {name: np.ndarray} — the exact inverse of convert_state_dict, enabling
    the reference PyTorch stack (`experiments/siammask_sharp/custom.py`) to
    run OUR trained checkpoints. Round-trip parity is pinned in
    tests/test_model_parity.py. Emits num_batches_tracked=0 for every BN
    (the reference's load_pretrain is strict about names, and torch BN in
    eval mode never reads it)."""
    state: dict = {}
    for path, value in _flatten(variables["params"]).items():
        name, transpose = _torch_name(path)
        state[name] = _inv_conv_kernel(value) if transpose else value
    for path, value in _flatten(variables.get("batch_stats", {})).items():
        name, _ = _torch_name(path)
        state[name] = value
        if name.endswith("running_var"):
            state[name.replace("running_var", "num_batches_tracked")] = \
                np.asarray(0, np.int64)
    return state


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint and convert to flax variables.

    Accepts both full training checkpoints ({'state_dict': ...}; see
    `tools/train_siammask.py:194-203`) and bare state_dicts."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    state_np = {k: v.detach().cpu().numpy() for k, v in state.items()
                if hasattr(v, "detach")}
    return convert_state_dict(state_np)
