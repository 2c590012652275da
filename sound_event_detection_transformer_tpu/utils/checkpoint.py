"""Checkpointing: orbax-backed save/restore + cross-topology weight surgery,
SaveBest / EarlyStopping policies, source back-up.

Reference behaviors re-expressed (/root/reference):
  * ``torch.save(state)`` dicts (train_sedt.py:275-284) -> orbax PyTree
    checkpoints holding {params, frozen, opt_state?, ema?, epoch, metrics};
  * pretrain -> finetune query-slot surgery: self-supervised checkpoints have
    no audio-tag query, so ``query_embed`` rows shift by one and
    ``class_embed`` is dropped (train_sedt.py:243-254);
  * audio-tag -> SP-SEDT backbone import (train_spsedt.py:133-142);
  * SaveBest (utils.py:113-150) and EarlyStopping with init grace + fusion
    round-robin (utils.py:153-212);
  * ``back_up_code`` source snapshot (utils.py:583-598).
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """Save a pytree-of-arrays state dict to ``path`` (one msgpack file).

    flax msgpack + atomic rename: repeated best-model overwrites
    (SaveBest fires most epochs early on) stay crash-safe.  For multi-host
    sharded checkpoints orbax remains available via ``use_orbax=True`` in a
    future extension; single-host SEDT states are < 1 GB.
    """
    from flax import serialization

    path = os.path.abspath(path)
    if os.path.isdir(path):
        shutil.rmtree(path)  # migrate from older directory checkpoints
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # to_state_dict flattens namedtuples (e.g. optax opt_state) into dicts
    state = serialization.to_state_dict(state)
    # one pipelined device->host fetch: jax.device_get issues
    # copy_to_host_async on every leaf before blocking, where a per-leaf
    # np.asarray would serialize a full round-trip per array (~40 ms each
    # through the axon tunnel -- hundreds of leaves made best-checkpoint
    # saves a multi-10-second stall in the eval loop)
    state = jax.device_get(state)
    state = jax.tree.map(np.asarray, state)
    blob = serialization.msgpack_serialize(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    from flax import serialization

    with open(os.path.abspath(path), "rb") as f:
        state = serialization.msgpack_restore(f.read())
    if template is not None:
        return serialization.from_state_dict(template, state)
    return state


# ---------------------------------------------------------------------------
# weight surgery
# ---------------------------------------------------------------------------


def load_pretrain_into(params: Any, pretrain_params: Any) -> Any:
    """SP-SEDT pretrain -> SEDT fine-tune surgery (train_sedt.py:243-254).

    The self-supervised model has ``num_queries`` query rows and no audio-tag
    slot; the fine-tune model (dec_at) has ``num_queries + 1``.  Copies every
    matching-shaped leaf except ``class_embed`` and ``query_embed``; the
    pretrained query rows land at slots 1: of the new table.
    """
    flat_new = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_old = jax.tree_util.tree_flatten_with_path(pretrain_params)[0]
    name = lambda p: "/".join(k.key if hasattr(k, "key") else str(k) for k in p)
    old_by_name = {name(p): v for p, v in flat_old}

    def merge(path, leaf):
        n = name(path)
        if "class_embed" in n:
            return leaf
        if "query_embed" in n:
            old = old_by_name.get(n)
            if old is None:
                return leaf
            if old.shape[0] == leaf.shape[0] - 1:
                return jnp.asarray(leaf).at[1:, :].set(jnp.asarray(old))
            if old.shape == leaf.shape:
                return jnp.asarray(old)
            return leaf
        old = old_by_name.get(n)
        if old is not None and tuple(old.shape) == tuple(leaf.shape):
            return jnp.asarray(old)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)


def load_audio_tag_backbone(params: Any, at_params: Any) -> Any:
    """Audio-tag checkpoint -> SEDT/SP-SEDT backbone init
    (train_spsedt.py:133-142): copies the ``backbone`` subtree."""
    if "backbone" in at_params and "backbone" in params:
        out = dict(params)
        src = at_params["backbone"]

        def merge(new_leaf, old_leaf):
            return (
                jnp.asarray(old_leaf)
                if tuple(np.shape(old_leaf)) == tuple(np.shape(new_leaf))
                else new_leaf
            )

        out["backbone"] = jax.tree.map(merge, params["backbone"], src)
        return out
    return params


# ---------------------------------------------------------------------------
# save-best / early stopping
# ---------------------------------------------------------------------------


class SaveBest:
    """(reference utils.py:113-150)"""

    def __init__(self, val_comp: str = "sup"):
        assert val_comp in ("inf", "sup")
        self.val_comp = val_comp
        self.best_val = np.inf if val_comp == "inf" else -np.inf
        self.best_epoch = 0
        self.current_epoch = 0

    def apply(self, value: float) -> bool:
        decision = False
        if self.current_epoch == 0:
            decision = True
        if (self.val_comp == "inf" and value < self.best_val) or (
            self.val_comp == "sup" and value > self.best_val
        ):
            self.best_epoch = self.current_epoch
            self.best_val = value
            decision = True
        self.current_epoch += 1
        return decision

    def state_dict(self):
        return {
            "best_val": float(self.best_val),
            "best_epoch": self.best_epoch,
            "current_epoch": self.current_epoch,
        }

    def load_state_dict(self, sd) -> None:
        self.best_val = float(sd["best_val"])
        self.best_epoch = int(sd["best_epoch"])
        self.current_epoch = int(sd["current_epoch"])


class EarlyStopping:
    """Patience-based stop with initial grace period and per-fusion-strategy
    round-robin (reference utils.py:153-212)."""

    def __init__(self, patience: int = 50, val_comp: str = "sup",
                 init_patience: int = 50, fusion_strategy=(1,)):
        assert val_comp in ("inf", "sup")
        self.patience = patience
        self.init_patience = init_patience
        self.val_comp = val_comp
        self.fusion_strategy = list(fusion_strategy)
        self.best_val = {
            m: (np.inf if val_comp == "inf" else -np.inf) for m in self.fusion_strategy
        }
        self.best_epoch = {m: 0 for m in self.fusion_strategy}
        self.current_epoch = 0
        self._idx = 0

    def apply(self, value: float) -> bool:
        """Feed one metric (strategies round-robin).  True => stop."""
        m = self.fusion_strategy[self._idx]
        self._idx = (self._idx + 1) % len(self.fusion_strategy)
        improved = (self.val_comp == "inf" and value < self.best_val[m]) or (
            self.val_comp == "sup" and value > self.best_val[m]
        )
        if improved:
            self.best_val[m] = value
            self.best_epoch[m] = self.current_epoch
        if self._idx == 0:
            self.current_epoch += 1
        if self.current_epoch < self.init_patience:
            return False
        return all(
            self.current_epoch - self.best_epoch[m] > self.patience
            for m in self.fusion_strategy
        )

    def state_dict(self):
        # msgpack keys must be strings; fusion strategies are small ints
        return {
            "best_val": {str(m): float(v) for m, v in self.best_val.items()},
            "best_epoch": {str(m): int(v) for m, v in self.best_epoch.items()},
            "current_epoch": self.current_epoch,
            "idx": self._idx,
        }

    def load_state_dict(self, sd) -> None:
        for m in self.fusion_strategy:
            if str(m) in sd["best_val"]:
                self.best_val[m] = float(sd["best_val"][str(m)])
                self.best_epoch[m] = int(sd["best_epoch"][str(m)])
        self.current_epoch = int(sd["current_epoch"])
        self._idx = int(sd["idx"])


def back_up_code(store_dir: str, info: str, src_root: Optional[str] = None) -> str:
    """Snapshot the package source under ``<store_dir>/code_backup/<info>/``
    (reference utils.py:583-598)."""
    src_root = src_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(store_dir, "code_backup", info)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(
        src_root, dst,
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc", ".git", "exp", "data"),
    )
    return dst
