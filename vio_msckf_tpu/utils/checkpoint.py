"""Filter-state checkpoint / resume.

The reference has no state serialization of any kind (SURVEY.md section 5);
runs are start-to-finish. Here the whole engine carry is one fixed-shape
pytree, so checkpointing is a flatten + savez and resume is an exact
restore — the run continues bit-identically from the saved frame.
"""

import json

import numpy as np
import jax


_META_KEY = "__vio_meta__"


def save_checkpoint(path, carry, step=0, extra=None):
    """Write the carry pytree (and a step counter) to one .npz file."""
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = dict(
        n_leaves=len(leaves),
        step=int(step),
        treedef=str(treedef),
        extra=extra or {},
    )
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_checkpoint(path, like):
    """Restore a carry saved by save_checkpoint.

    `like` is a template carry (same structure, e.g. engine.init()); its
    treedef is used to unflatten and its leaf dtypes are preserved.
    Returns (carry, step, extra).
    """
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    meta = json.loads(bytes(data[_META_KEY].tobytes()).decode())
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    n = meta["n_leaves"]
    assert n == len(like_leaves), (
        f"checkpoint has {n} leaves, template has {len(like_leaves)}"
    )
    leaves = []
    for i, tmpl in enumerate(like_leaves):
        arr = data[f"leaf_{i}"]
        tmpl_arr = np.asarray(tmpl)
        assert arr.shape == tmpl_arr.shape, (
            f"leaf {i}: saved {arr.shape} != template {tmpl_arr.shape}"
        )
        leaves.append(arr.astype(tmpl_arr.dtype))
    carry = jax.tree_util.tree_unflatten(treedef, leaves)
    return carry, meta["step"], meta.get("extra", {})
