"""Checkpoint save/load: Orbax pytrees + torch .pth interop.

Replaces the reference's .pth ring-buffer checkpointing
(runner_base.py:592-672): trainable-only param trees are saved per epoch
with ``max_checkpoints`` retention, plus optimizer state and step counters.
Torch checkpoints (the pretrained bootstrap chain, SURVEY.md §5.4) load
through ``load_params`` for the strict=False merge path.
"""

from __future__ import annotations

import logging
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# tree utilities
# ---------------------------------------------------------------------------
def merge_trees(base: Dict, incoming: Dict) -> Tuple[Dict, int, int]:
    """strict=False merge: leaves present in both are taken from incoming
    (shape-checked, cast to the base leaf's dtype so fp32 npz weights don't
    silently double a bf16 model's memory); unknown incoming keys are
    counted and skipped."""
    merged, loaded, skipped = merge_with_paths(base, incoming)
    return merged, len(loaded), len(skipped)


def merge_with_paths(
    base: Dict, incoming: Dict, prefix: str = ""
) -> Tuple[Dict, list, list]:
    """Like merge_trees but returns the full 'a/b/c' path lists:
    (merged, loaded_paths, skipped_paths).  The accounting backbone of the
    pretrained-weight bootstrap chain (reference blip2.py:91-110 logs the
    strict=False missing/unexpected keys; here every leaf is tracked)."""
    loaded: list = []
    skipped: list = []

    def cast_like(b_leaf, v):
        v = np.asarray(v)
        want = getattr(b_leaf, "dtype", None)
        if want is not None and v.dtype != want:
            v = v.astype(want)
        return v

    def rec(b, inc, path):
        if not isinstance(b, dict) or not isinstance(inc, dict):
            return inc
        out = dict(b)
        for k, v in inc.items():
            p = f"{path}/{k}" if path else str(k)
            if k in b:
                if isinstance(v, dict) and isinstance(b[k], dict):
                    out[k] = rec(b[k], v, p)
                else:
                    if tuple(np.shape(b[k])) != tuple(np.shape(v)):
                        logging.warning("shape mismatch at %s: %s vs %s — skipped",
                                        p, np.shape(b[k]), np.shape(v))
                        skipped.append(p)
                    else:
                        out[k] = cast_like(b[k], v)
                        loaded.append(p)
            else:
                skipped.append(p)
        return out

    return rec(base, incoming, prefix), loaded, skipped


def tree_paths(tree: Dict, prefix: str = "") -> list:
    """All leaf paths 'a/b/c' of a nested dict."""
    out = []
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.extend(tree_paths(v, p))
        else:
            out.append(p)
    return out


def split_by_predicate(tree: Dict, predicate) -> Tuple[Dict, Dict]:
    """Split a nested dict into (true_tree, false_tree) by leaf-path predicate.

    Functional replacement for requires_grad freezing: predicate gets
    'a/b/c' paths; empty subtrees are dropped.
    """

    def rec(node, path):
        if not isinstance(node, dict):
            return (node, None) if predicate(path) else (None, node)
        t, f = {}, {}
        for k, v in node.items():
            tv, fv = rec(v, f"{path}/{k}" if path else k)
            if tv is not None:
                t[k] = tv
            if fv is not None:
                f[k] = fv
        return (t or None), (f or None)

    t, f = rec(tree, "")
    return t or {}, f or {}


def overlay_trees(*trees: Dict) -> Dict:
    """Recombine disjoint subtrees (inverse of split_by_predicate)."""
    out: Dict = {}

    def rec(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                rec(dst.setdefault(k, {}), v)
            else:
                dst[k] = v

    for t in trees:
        rec(out, t)
    return out


# ---------------------------------------------------------------------------
# load / save
# ---------------------------------------------------------------------------
def load_params(path: str) -> Dict:
    """Load a param tree from an Orbax dir, .npz, or torch .pth file."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=False))
        return unflatten_dict(flat)
    if path.endswith((".pth", ".pt", ".bin")):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(ckpt, dict) and "model" in ckpt:
            ckpt = ckpt["model"]
        return {k: np.asarray(v.float().numpy() if hasattr(v, "float") else v)
                for k, v in ckpt.items()}
    raise ValueError(f"Unsupported checkpoint format: {path}")


def flatten_dict(tree: Dict, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_dict(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_dict(flat: Dict[str, Any]) -> Dict:
    out: Dict = {}
    for key, v in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_params(path: str, tree: Dict) -> None:
    """Save a param tree as .npz (portable, host-side)."""
    flat = flatten_dict(jax.tree_util.tree_map(np.asarray, tree))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


class CheckpointManager:
    """Epoch checkpoints with ring retention (runner_base.py:592-628)."""

    def __init__(self, output_dir: str, max_checkpoints: int = -1):
        self.output_dir = output_dir
        self.max_checkpoints = max_checkpoints
        self._saved: list = []
        os.makedirs(output_dir, exist_ok=True)

    def _path(self, tag) -> str:
        return os.path.join(self.output_dir, f"checkpoint_{tag}")

    def save(self, tag, state: Dict) -> str:
        """state: json-able scalars + param/opt trees. Saved as orbax dir.

        COLLECTIVE in multi-process jobs: orbax synchronizes all processes
        inside ``save`` (a rank-gated call deadlocks on the name barrier),
        so every process must call this with the SAME shared path; the
        primary host writes the (replicated) arrays, rank 0 alone handles
        the directory clear and ring deletion.
        """
        import orbax.checkpoint as ocp

        from myriad_tpu.common import dist

        path = os.path.abspath(self._path(tag))
        if dist.is_main_process() and os.path.exists(path):
            shutil.rmtree(path)
        dist.barrier("ckpt_clear")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state)
        ckptr.wait_until_finished()
        if isinstance(tag, int) or (isinstance(tag, str) and tag.isdigit()):
            self._saved.append(path)
            if self.max_checkpoints > 0 and len(self._saved) > self.max_checkpoints:
                victim = self._saved.pop(0)
                if dist.is_main_process():
                    shutil.rmtree(victim, ignore_errors=True)
        return path

    def restore(self, tag) -> Optional[Dict]:
        import orbax.checkpoint as ocp

        path = os.path.abspath(self._path(tag))
        if not os.path.exists(path):
            return None
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path)
