"""Checkpointing: params + batch stats + optimizer state + epoch + anchor config.

Mirrors the reference checkpoint contents (`tools/train_siammask.py:194-203`
saves {epoch, arch, state_dict, optimizer, anchor_cfg}) in a flax-msgpack file.
PyTorch `.pth` checkpoints are imported via utils/torch_convert.py instead.
"""
from __future__ import annotations

import os

import numpy as np

import jax
from flax import serialization


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, variables: dict, opt_state=None, epoch: int = 0,
                    arch: str = "Custom", anchor_cfg: dict | None = None):
    data = {
        "epoch": epoch,
        "arch": arch,
        "variables": _to_numpy(serialization.to_state_dict(variables)),
        "anchor_cfg": anchor_cfg or {},
    }
    if opt_state is not None:
        data["opt_state"] = _to_numpy(serialization.to_state_dict(opt_state))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(data))


def load_checkpoint(path: str, opt_state_target=None) -> dict:
    """Returns {'variables', 'epoch', 'arch', 'anchor_cfg'[, 'opt_state']}.

    Pass ``opt_state_target`` (a freshly-initialized optimizer state) to restore
    the optimizer pytree structure."""
    with open(path, "rb") as f:
        data = serialization.msgpack_restore(f.read())
    out = {
        "variables": data["variables"],
        "epoch": int(data["epoch"]),
        "arch": data.get("arch", "Custom"),
        "anchor_cfg": data.get("anchor_cfg", {}),
    }
    if "opt_state" in data and opt_state_target is not None:
        out["opt_state"] = serialization.from_state_dict(opt_state_target,
                                                         data["opt_state"])
    elif "opt_state" in data:
        out["opt_state_raw"] = data["opt_state"]
    return out
