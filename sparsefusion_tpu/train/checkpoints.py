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


def maybe_import_reference_weights(models, eft_ckpt: Optional[str] = None,
                                   vae_ckpt: Optional[str] = None,
                                   vldm_ckpt: Optional[str] = None,
                                   verbose: bool = True):
    """Load any provided torch checkpoints into the model bundle
    (mirrors the load order/printout of ``utils/load_model.py:32-97``)."""
    from sparsefusion_tpu.train import convert as C

    if eft_ckpt and os.path.exists(eft_ckpt):
        sd = C.load_torch_state_dict(eft_ckpt)
        converted = C.convert_eft_state_dict(sd)
        models.eft_vars = jax.tree_util.tree_map(
            lambda x: x, {**models.eft_vars, **converted})
        if verbose:
            print("LOADING 1/3 loaded eft checkpoint from", eft_ckpt)
    elif verbose:
        print("LOADING 1/3 initialized eft from scratch")

    if vae_ckpt and os.path.exists(vae_ckpt):
        sd = C.strip_sd_prefixes(C.load_torch_state_dict(vae_ckpt,
                                                         key="state_dict"))
        models.vae_vars = C.convert_vae_state_dict(sd)
        if verbose:
            print("LOADING 2/3 loaded sd vae from", vae_ckpt)
    elif verbose:
        print("LOADING 2/3 initialized vae from scratch")

    if vldm_ckpt and os.path.exists(vldm_ckpt):
        sd = C.load_torch_state_dict(vldm_ckpt)
        models.unet_params = C.convert_unet_state_dict(sd)
        if verbose:
            print("LOADING 3/3 loaded diffusion from", vldm_ckpt)
    elif verbose:
        print("LOADING 3/3 loaded diffusion from scratch")
    return models
