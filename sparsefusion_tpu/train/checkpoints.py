"""Native checkpoint save/restore (orbax) + torch-checkpoint import.

Replaces ``save_model``/``load_model`` (``train.py:466-541``,
``utils/load_model.py``): native checkpoints are orbax PyTree dirs holding
``{step, params, opt_state}``; pretrained reference weights import through
``train/convert.py``.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, tree: Dict[str, Any]):
    """Save a pytree (params/opt state/step) to ``path`` (a directory)."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    tree = jax.tree_util.tree_map(np.asarray, tree)
    ckpt.save(path, tree, force=True)


def restore_checkpoint(path: str,
                       target: Optional[Dict[str, Any]] = None
                       ) -> Dict[str, Any]:
    """Restore a checkpoint; pass ``target`` (a same-structure pytree,
    e.g. freshly initialized state) to recover container types like the
    optax NamedTuple states, which otherwise come back as plain dicts."""
    ckpt = _checkpointer()
    path = os.path.abspath(path)
    if target is None:
        return ckpt.restore(path)
    import jax
    import orbax.checkpoint as ocp

    shapes = jax.tree_util.tree_map(
        lambda x: ocp.utils.to_shape_dtype_struct(x)
        if hasattr(x, "shape") else x, target)
    return ckpt.restore(path, item=shapes)


def load_npz_pytree(path: str) -> Dict[str, Any]:
    """Load a flat 'a/b/c'-keyed npz (tools/convert_weights.py output)
    back into a nested pytree of numpy arrays."""
    flat = np.load(path)
    tree: Dict[str, Any] = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree


def maybe_import_reference_weights(models, eft_ckpt: Optional[str] = None,
                                   vae_ckpt: Optional[str] = None,
                                   vldm_ckpt: Optional[str] = None,
                                   verbose: bool = True):
    """Load any provided checkpoints into the model bundle — either raw
    torch .pt/.ckpt files (converted on the fly) or pre-converted .npz
    from tools/convert_weights.py.  Mirrors the load order/printout of
    ``utils/load_model.py:32-97``."""
    from sparsefusion_tpu.train import convert as C

    if eft_ckpt and os.path.exists(eft_ckpt):
        if eft_ckpt.endswith(".npz"):
            converted = load_npz_pytree(eft_ckpt)
        else:
            converted = C.convert_eft_state_dict(
                C.load_torch_state_dict(eft_ckpt))
        models.eft_vars = jax.tree_util.tree_map(
            lambda x: x, {**models.eft_vars, **converted})
        if verbose:
            print("LOADING 1/3 loaded eft checkpoint from", eft_ckpt)
    elif verbose:
        print("LOADING 1/3 initialized eft from scratch")

    if vae_ckpt and os.path.exists(vae_ckpt):
        if vae_ckpt.endswith(".npz"):
            models.vae_vars = load_npz_pytree(vae_ckpt)
        else:
            sd = C.strip_sd_prefixes(
                C.load_torch_state_dict(vae_ckpt, key="state_dict"))
            models.vae_vars = C.convert_vae_state_dict(sd)
        if verbose:
            print("LOADING 2/3 loaded sd vae from", vae_ckpt)
    elif verbose:
        print("LOADING 2/3 initialized vae from scratch")

    if vldm_ckpt and os.path.exists(vldm_ckpt):
        if vldm_ckpt.endswith(".npz"):
            models.unet_params = load_npz_pytree(vldm_ckpt)
        else:
            models.unet_params = C.convert_unet_state_dict(
                C.load_torch_state_dict(vldm_ckpt))
        if verbose:
            print("LOADING 3/3 loaded diffusion from", vldm_ckpt)
    elif verbose:
        print("LOADING 3/3 loaded diffusion from scratch")
    return models


def import_resnet18_trunk(models, path: Optional[str],
                          verbose: bool = True):
    """Load a torchvision resnet18 state dict into the EFT encoder trunk
    (the reference constructs EFT with ``resnet18(pretrained=True)``,
    ``sparsefusion/eft.py:99``; conv1..layer3 are all it uses)."""
    if not path or not os.path.exists(path):
        if verbose and path:
            print(f"WARNING: resnet18 weights not found at {path}; "
                  "EFT trunk stays randomly initialized")
        return models
    from sparsefusion_tpu.train import convert as C

    if path.endswith(".npz"):
        tree = load_npz_pytree(path)
        params, stats = tree["params"], tree["batch_stats"]
    else:
        sd = C.load_torch_state_dict(path, key=None)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params, stats = C.convert_resnet18_trunk(sd, prefix="")
    ev = dict(models.eft_vars)
    ev_params = dict(ev.get("params", {}))
    ev_stats = dict(ev.get("batch_stats", {}))
    ev_params["encoder_model"] = params
    ev_stats["encoder_model"] = stats
    ev["params"] = ev_params
    ev["batch_stats"] = ev_stats
    models.eft_vars = jax.tree_util.tree_map(np.asarray, ev)
    if verbose:
        print("loaded pretrained resnet18 trunk from", path)
    return models
