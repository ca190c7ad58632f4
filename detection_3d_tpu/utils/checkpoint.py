"""Checkpointing with auto-resume tag.

Parity with the reference Checkpointer
(/root/reference/maskrcnn_benchmark/utils/checkpoint.py:13-100):
  * save(name, **extras) packs params/opt_state/iteration into one file;
  * a ``last_checkpoint`` tag file records the latest path so load() with
    no argument resumes automatically, overriding any explicit weight;
  * partial / name-matching load is handled by flax's state-dict restore
    (missing keys keep their initialized values).

Serialization via flax.serialization msgpack (pytree-safe, no pickle of
code).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


class Checkpointer:
    def __init__(self, save_dir: str, logger=None):
        self.save_dir = save_dir
        self.logger = logger
        os.makedirs(save_dir, exist_ok=True)

    def _tag_file(self):
        return os.path.join(self.save_dir, "last_checkpoint")

    def has_checkpoint(self) -> bool:
        return os.path.exists(self._tag_file())

    def get_checkpoint_file(self) -> str:
        try:
            with open(self._tag_file()) as f:
                return f.read().strip()
        except OSError:
            return ""

    def save(self, name: str, state: Dict[str, Any]):
        """state: dict of pytrees (params, opt_state, iteration, ...)."""
        path = os.path.join(self.save_dir, f"{name}.msgpack")
        data = serialization.to_bytes(
            jax.tree_util.tree_map(lambda x: x, state))
        with open(path, "wb") as f:
            f.write(data)
        with open(self._tag_file(), "w") as f:
            f.write(os.path.basename(path))
        if self.logger:
            self.logger.info("Saved checkpoint to %s", path)
        return path

    def load(self, template: Dict[str, Any],
             path: Optional[str] = None) -> Dict[str, Any]:
        """Restore into the shape of ``template``. Auto-resume beats the
        explicit path (checkpoint.py:32-47 semantics)."""
        if self.has_checkpoint():
            resume = self.get_checkpoint_file()
            # tag stores a basename; resolve against save_dir so moving
            # the output dir does not break resume (absolute paths kept
            # for backward compatibility with older tags)
            if not os.path.isabs(resume):
                resume = os.path.join(self.save_dir, resume)
            if path and self.logger and os.path.abspath(path) != \
                    os.path.abspath(resume):
                self.logger.warning(
                    "auto-resume from %s overrides explicitly requested "
                    "weights %s (delete the last_checkpoint tag to force "
                    "the explicit path)", resume, path)
            path = resume
        if not path or not os.path.exists(path):
            if self.logger:
                self.logger.info("No checkpoint found; starting fresh")
            return template
        with open(path, "rb") as f:
            data = f.read()
        restored = serialization.from_bytes(template, data)
        if self.logger:
            self.logger.info("Loaded checkpoint from %s", path)
        return restored

    def prune(self, keep_last: int = 0) -> list:
        """Delete stale periodic snapshots (reference clean_models.py:1-20):
        every ``model_*.msgpack`` except the tagged last checkpoint,
        ``model_final`` and ``model_min_loss`` is removed. ``keep_last``
        additionally spares the N newest periodic snapshots. Returns the
        removed paths."""
        import glob
        keep = {os.path.join(self.save_dir, "model_final.msgpack"),
                os.path.join(self.save_dir, "model_min_loss.msgpack")}
        tagged = self.get_checkpoint_file()
        if tagged:
            if not os.path.isabs(tagged):
                tagged = os.path.join(self.save_dir, tagged)
            keep.add(tagged)
        snaps = sorted(
            p for p in glob.glob(os.path.join(self.save_dir,
                                              "model_*.msgpack"))
            if p not in keep)
        if keep_last > 0:
            snaps = snaps[:-keep_last]
        for p in snaps:
            os.remove(p)
            if self.logger:
                self.logger.info("pruned stale checkpoint %s", p)
        return snaps
