"""Map/state checkpointing — save and resume a full VO session.

The reference has no checkpoint/resume (SURVEY.md §5: 'None in the SLAM
sense'); its only state export is the destructor trajectory dump. Here the
entire pipeline state is a fixed-shape pytree, so checkpointing is a flat
npz of leaves keyed by tree path — bit-exact resume, no schema code.
"""

from __future__ import annotations

import numpy as np
import jax


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_state(path: str, state) -> None:
    """Save a pytree (e.g. StereoVOState) to an npz file."""
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {_path_str(p): np.asarray(v) for p, v in leaves}
    np.savez_compressed(path, **arrays)


def load_state(path: str, template):
    """Load into the structure of `template` (same pytree type/shapes)."""
    data = np.load(path)
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for p, tmpl in paths_leaves:
        key = _path_str(p)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf '{key}'")
        arr = data[key]
        if arr.shape != tuple(np.shape(tmpl)):
            raise ValueError(f"leaf '{key}' shape {arr.shape} != template {np.shape(tmpl)}")
        new_leaves.append(jax.numpy.asarray(arr, dtype=np.asarray(tmpl).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_vo(path: str, vo) -> None:
    """Checkpoint a MonoVO/StereoVO driver (device state + host metadata)."""
    import json
    import os

    save_state(path + ".state.npz", vo.state)
    meta = {
        "phase": getattr(vo, "phase", None),
        "trajectory": [T.tolist() for T in vo.trajectory],
        "kf_trajectory": [[i, T.tolist()] for i, T in vo.kf_trajectory],
    }
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_vo(path: str, vo) -> None:
    """Resume a driver in place (vo must be freshly constructed with the
    same config; its first frame must NOT have been processed)."""
    import json

    import numpy as np

    if vo.state is None:
        # Build a template state with the right shapes.
        import jax.numpy as jnp

        if hasattr(vo, "init_state"):
            h, w = vo.cfg.cam.height, vo.cfg.cam.width
            vo.state = vo.init_state(vo._build_pyr(jnp.zeros((h, w), jnp.float32)))
        else:
            h, w = vo.cfg.cam.height, vo.cfg.cam.width
            vo.state = vo._first_frame(jnp.zeros((h, w), jnp.float32))
    vo.state = load_state(path + ".state.npz", vo.state)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    if meta.get("phase") is not None and hasattr(vo, "phase"):
        vo.phase = meta["phase"]
    vo.trajectory = [np.asarray(T, np.float32) for T in meta["trajectory"]]
    vo.kf_trajectory = [(int(i), np.asarray(T, np.float32)) for i, T in meta["kf_trajectory"]]
