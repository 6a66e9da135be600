"""REAL two-process ``jax.distributed`` smoke (VERDICT round-2 item 5).

The reference rendezvouses workers with MASTER_ADDR/MASTER_PORT +
``dist.init_process_group`` (``demo.py:108-137``, ``train.py:546-568``).
Our equivalent is ``maybe_init_distributed`` (env-gated
``jax.distributed.initialize``), which round 2 only exercised on its
no-op path.  Here we actually launch TWO processes against a localhost
coordinator and assert:

* ``jax.process_count() == 2`` on both workers,
* each worker sees its own local devices inside the global device list,
* ``shard_scene_list`` splits disjointly + exhaustively across ranks,
* a cross-process collective (global sum over a process-sharded array)
  returns the correct value on both ranks.

Runs on the CPU backend (2 virtual devices per process -> 4 global).
"""
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from sparsefusion_tpu.parallel.mesh import (
    maybe_init_distributed, make_mesh, shard_scene_list)

assert maybe_init_distributed(verbose=False), "env rendezvous not taken"
pid = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2, jax.local_device_count()
assert jax.device_count() == 4, jax.device_count()

# scene-level eval sharding across hosts (demo.py:59 semantics)
shard = shard_scene_list(range(10), jax.process_count(), pid)
print("SHARD", pid, ",".join(map(str, shard)), flush=True)

# cross-process collective: global sum of a process-sharded array
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = make_mesh()  # all 4 global devices
sharding = NamedSharding(mesh, P("data"))
local = jnp.full((2, 3), float(pid + 1))  # rank0 -> 1s, rank1 -> 2s
garr = jax.make_array_from_process_local_data(sharding, local, (4, 3))

@jax.jit
def global_sum(x):
    return jnp.sum(x)

s = float(global_sum(garr))
# rows: 2 of 1.0 and 2 of 2.0, 3 cols -> 2*3*1 + 2*3*2 = 18
assert abs(s - 18.0) < 1e-6, s
print("SUM", pid, s, flush=True)

# one tiny replicated-param DP grad step across hosts: grads on the
# sharded batch all-reduce automatically from the sharded-grad graph
w = jax.device_put(jnp.ones((3,)), NamedSharding(mesh, P()))
x = garr  # (4, 3) sharded over data

@jax.jit
def step(w, x):
    def loss(w):
        return jnp.mean((x @ w) ** 2)
    l, g = jax.value_and_grad(loss)(w)
    return l, w - 0.1 * g

l, w2 = step(w, x)
print("LOSS", pid, round(float(l), 6), flush=True)
print("OK", pid, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # The axon sitecustomize (PYTHONPATH'd into every python process)
        # registers the TPU-relay PJRT plugin whenever PALLAS_AXON_POOL_IPS
        # is set — and plugin init can block indefinitely on a dead relay
        # even under JAX_PLATFORMS=cpu.  Strip the trigger so the CPU-only
        # workers are hermetic.
        for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                  "AXON_LOOPBACK_RELAY"):
            env.pop(k, None)
        env.update({
            "SF_COORDINATOR": f"127.0.0.1:{port}",
            "SF_NUM_PROCESSES": "2",
            "SF_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            # don't inherit the parent test process's 8-device flag
            "JAX_PLATFORM_NAME": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    outs = []
    try:
        # generous: two cold jax imports + distributed rendezvous +
        # compiles share ONE host core (and possibly a busy one)
        for p in procs:
            out, err = p.communicate(timeout=900)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()

    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
        assert "OK" in out

    # disjoint + exhaustive scene shards
    shards = {}
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith("SHARD"):
                _, pid, items = line.split(" ", 2)
                shards[int(pid)] = [int(v) for v in items.split(",")]
    assert sorted(shards[0] + shards[1]) == list(range(10))
    assert not (set(shards[0]) & set(shards[1]))

    # both ranks computed the same global collective + loss
    sums = [l for _, out, _ in outs for l in out.splitlines()
            if l.startswith("SUM")]
    losses = [l.split()[2] for _, out, _ in outs for l in out.splitlines()
              if l.startswith("LOSS")]
    assert len(sums) == 2 and len(losses) == 2
    assert losses[0] == losses[1]
