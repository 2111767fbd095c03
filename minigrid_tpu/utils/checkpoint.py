"""Checkpoint / resume.

The reference has no checkpointing; its nearest equivalents are pickling
envs and Grid.encode/decode round-trips (SURVEY.md §5). Here environment
state is a pytree of arrays, so checkpointing entire *batches* of episodes
(plus learner params/optimizer state) is plain array serialization — via
orbax when available, with a numpy .npz fallback.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree of arrays. Uses orbax if importable, else .npz."""
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.abspath(path), tree, force=True)
        ckpt.wait_until_finished()
        return
    except Exception:
        pass
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    # keypaths are the version-tolerant structure encoding: repr(treedef)
    # is not stable across jax versions, but the flattened key paths
    # ("['params']['dense']['kernel']", ...) are semantic and ordered, so
    # they catch same-shape-different-order drift (e.g. renamed/reordered
    # dict keys zipping leaves into the wrong parameters)
    keypaths = np.array([jax.tree_util.keystr(p) for p, _ in
                         jax.tree_util.tree_flatten_with_path(tree)[0]])
    np.savez(path if path.endswith(".npz") else path + ".npz",
             treedef=np.frombuffer(repr(treedef).encode(), dtype=np.uint8),
             keypaths=keypaths,
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def restore_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_pytree`, shaped like ``like``."""
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(os.path.abspath(path), like)
    except Exception:
        pass
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten(like)
    # validate against the stored structure: restoring into a drifted
    # pytree would silently mis-assign leaves. Keypaths are the primary
    # check — semantic, ordered, stable across jax versions — and a
    # mismatch is a hard error (same leaf count AND shapes but reordered
    # keys would otherwise zip weights into the wrong parameters).
    if "keypaths" in npz:
        saved_paths = [str(s) for s in npz["keypaths"]]
        like_paths = [jax.tree_util.keystr(p) for p, _ in
                      jax.tree_util.tree_flatten_with_path(like)[0]]
        if saved_paths != like_paths:
            diff = [f"  {a!r} -> {b!r}" for a, b in
                    zip(saved_paths, like_paths) if a != b][:8]
            raise ValueError(
                "checkpoint pytree key paths do not match the restore "
                "target (leaves would be mis-assigned):\n" + "\n".join(
                    diff or ["  (leaf count differs)"]))
    elif "treedef" in npz:
        saved = bytes(npz["treedef"]).decode()
        if saved != repr(treedef):
            # pre-keypath checkpoints: repr(PyTreeDef) is not stable
            # across jax versions, so a repr mismatch alone must not
            # reject a valid checkpoint — warn and rely on the leaf
            # count/shape checks below
            import warnings

            warnings.warn(
                "checkpoint pytree structure repr differs from the "
                "restore target (possibly only a jax version change); "
                "relying on leaf count/shape validation instead:\n saved:"
                f"    {saved}\n restoring into: {treedef!r}")
    n_saved = len([k for k in npz.files if k.startswith("leaf_")])
    if n_saved != len(leaves):
        raise ValueError(f"checkpoint has {n_saved} leaves; 'like' has "
                         f"{len(leaves)}")
    new_leaves = []
    for i, ref in enumerate(leaves):
        leaf = npz[f"leaf_{i}"]
        if tuple(leaf.shape) != tuple(np.shape(ref)):
            raise ValueError(
                f"checkpoint leaf {i} shape {leaf.shape} != expected "
                f"{np.shape(ref)}")
        new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def state_fingerprint(state) -> str:
    """sha256 fingerprint of an env state (the reference ``hash()``,
    minigrid_env.py:159-169, over array state)."""
    import hashlib

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(state):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()[:16]
