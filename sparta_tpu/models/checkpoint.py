"""Model checkpointing: save/restore param pytrees + block structure.

Orbax-backed when available (async, sharding-aware), with a plain-npz
fallback.  The block structure (cols_idx/nb_row per layer) is saved next to
the params so a checkpoint is self-describing: restoring rebuilds the same
pruned topology.
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np


def _flatten(params) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_params(path: str | Path, params, model=None) -> None:
    """Save a param pytree (npz) + the model's block structure (npz)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(params)
    np.savez_compressed(path, **flat)
    if model is not None:
        structure = {}
        for i, (up, down) in enumerate(zip(model.ffn_up, model.ffn_down)):
            structure[f"ffn_up_{i}_cols"] = np.asarray(up.cols_idx)
            structure[f"ffn_up_{i}_nb"] = np.asarray(up.nb_row)
            structure[f"ffn_down_{i}_cols"] = np.asarray(down.cols_idx)
            structure[f"ffn_down_{i}_nb"] = np.asarray(down.nb_row)
        for i, moe in enumerate(getattr(model, "moe", ()) or ()):
            structure[f"moe_{i}_up_cols"] = np.asarray(moe.up_cols)
            structure[f"moe_{i}_up_nb"] = np.asarray(moe.up_nb)
            structure[f"moe_{i}_dn_cols"] = np.asarray(moe.dn_cols)
            structure[f"moe_{i}_dn_nb"] = np.asarray(moe.dn_nb)
        np.savez_compressed(str(path) + ".structure.npz", **structure)
        meta = {k: v for k, v in vars(model.cfg).items()}
        Path(str(path) + ".meta.json").write_text(json.dumps(meta))


def load_params(path: str | Path, like=None):
    """Restore a param pytree saved by save_params.  With ``like`` (a params
    pytree of the same structure), leaves are reshaped into that treedef;
    otherwise a nested dict keyed by path is returned."""
    z = np.load(path)
    flat = {k: z[k] for k in z.files}
    if like is None:
        nested: dict = {}
        for key, val in flat.items():
            parts = key.split("/")
            cur = nested
            for p in parts[:-1]:
                cur = cur.setdefault(p, {})
            cur[parts[-1]] = val
        return nested
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path_elems, leaf in paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path_elems
        )
        val = flat[key]
        assert val.shape == leaf.shape, f"{key}: {val.shape} != {leaf.shape}"
        leaves.append(val.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_params_orbax(path: str | Path, params) -> None:
    """Sharding-aware checkpoint via Orbax (multi-host safe: each process
    writes its addressable shards; restores re-shard to the target mesh)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params_orbax(path: str | Path, like):
    """Restore an Orbax checkpoint into the structure/shardings of ``like``
    (a params pytree of jax arrays or ShapeDtypeStructs)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=getattr(x, "sharding", None)
        ),
        like,
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)
