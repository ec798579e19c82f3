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
    # Atomic publish: serialize to a sibling temp file, then rename. A crash
    # (power loss, OOM-kill) mid-write must never leave a truncated msgpack at
    # the published path — resume picks the newest checkpoint by name, so a
    # half-written file silently poisons the restart.
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(data))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


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


def merge_variables(init_vars: dict, loaded_vars: dict):
    """Non-strict warm start: overlay ``loaded_vars`` onto ``init_vars`` where
    paths and shapes match.

    The analogue of the reference's ``load_pretrain`` non-strict loading
    (utils/load_helper.py:30-54), which is how the two-stage flow feeds the
    stage-1 SiamMask-base checkpoint into stage-2 refine training: the refine
    module's params are absent from the checkpoint and keep their fresh init,
    everything shared (backbone/neck/rpn/mask) comes from the checkpoint.

    Returns (merged, missing, unused): ``missing`` = target paths kept at
    init (not in the checkpoint / shape mismatch), ``unused`` = checkpoint
    paths with no target."""
    missing, unused = [], []

    def walk(init, loaded, path):
        if not isinstance(init, dict):
            la = np.asarray(loaded)
            if tuple(np.shape(init)) != la.shape:
                missing.append(f"{path} (shape {tuple(np.shape(init))} != "
                               f"checkpoint {la.shape})")
                return init
            return la
        out = {}
        loaded = loaded if isinstance(loaded, dict) else {}
        for k, v in init.items():
            p = f"{path}/{k}" if path else k
            if k in loaded:
                out[k] = walk(v, loaded[k], p)
            else:
                missing.append(p)
                out[k] = v
        unused.extend(f"{path}/{k}" if path else k
                      for k in loaded if k not in init)
        return out

    merged = walk(serialization.to_state_dict(init_vars),
                  serialization.to_state_dict(loaded_vars), "")
    return serialization.from_state_dict(init_vars, merged), missing, unused
