"""Device-mesh helpers: the TPU-native replacement for NCCL DDP.

The reference scales with ``torch.distributed`` + DDP gradient all-reduce
(``train.py:258-295``) and embarrassingly-parallel scene sharding for
eval (``demo.py:59``).  Here:

* training: a 1-D ``Mesh`` over all devices with batches sharded on the
  ``data`` axis and parameters replicated — XLA inserts the gradient
  all-reduce over ICI automatically from the sharded-grad graph,
* eval: ``shard_scene_list`` splits the scene list by process index
  (multi-host) exactly like ``split_list(val_list, gpus)[gpu]``.

Multi-host initialization is ``jax.distributed.initialize()`` at the CLI
layer; everything here only needs ``jax.devices()``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparsefusion_tpu.utils.image import split_list


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree of (B, ...) arrays with B sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate_to_mesh(tree, mesh: Mesh):
    """Replicate a pytree (params, opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_scene_list(scene_indices, n_shards: int, shard_id: int):
    """Scene-level data parallelism for eval (``demo.py:59`` semantics)."""
    return split_list(list(scene_indices), n_shards)[shard_id]


def maybe_init_distributed(verbose: bool = True) -> bool:
    """Env-gated multi-host rendezvous (replaces the reference's
    MASTER_ADDR/MASTER_PORT + ``dist.init_process_group`` launch,
    ``demo.py:108-137``, ``train.py:546-568``).

    Set on every host before launching:

        SF_COORDINATOR=<host0-addr:port>   (e.g. 10.0.0.1:1234)
        SF_NUM_PROCESSES=<n hosts>
        SF_PROCESS_ID=<this host's rank>

    Plain ``jax.distributed.initialize()`` auto-detection still applies on
    TPU pods when only ``SF_DISTRIBUTED=1`` is set.  Returns True if
    initialization ran.  Must be called before the backend initializes.
    """
    import os

    coord = os.environ.get("SF_COORDINATOR")
    if coord:
        num = int(os.environ["SF_NUM_PROCESSES"])
        pid = int(os.environ["SF_PROCESS_ID"])
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=num, process_id=pid)
    elif os.environ.get("SF_DISTRIBUTED"):
        jax.distributed.initialize()
    else:
        return False
    if verbose:
        print(f"jax.distributed: process {jax.process_index()} / "
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    return True
