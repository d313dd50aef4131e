"""Multi-host (multi-process) training support.

The reference scales with 4-process NCCL DDP on one box
(``trainVIL.py:28-29,156-161``: ``init_process_group('nccl')`` + rank env
vars). The TPU-native equivalent is JAX multi-controller SPMD: every host
runs the same program, ``jax.distributed.initialize`` wires the
coordination service, and the SAME ``Mesh``/``NamedSharding`` annotations
used single-host extend transparently over all hosts' devices — GSPMD
inserts the cross-host collectives (gradient psum rides ICI on a real pod,
gloo on the CPU test fabric).

What each host does differently is purely data: it loads its own shard of
the batch (``ClipLoader(num_shards=process_count, shard_index=
process_index)``, the DistributedSampler equivalent) and assembles the
global batch with :func:`global_batch` from its local slice. Checkpointing
stays rank-0 (``train/checkpoint.py:46``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host cluster. Mirrors the reference's
    ``init_process_group`` call (``trainVIL.py:156-161``).

    With no arguments, reads the standard JAX cluster-env variables
    (or TPU metadata on a real pod). On the CPU fabric the 'gloo'
    collectives implementation is selected automatically.
    """
    # NB: must not touch the backend (jax.devices/default_backend) before
    # jax.distributed.initialize — read the requested platform from config.
    platforms = jax.config.jax_platforms or os.environ.get(
        "JAX_PLATFORMS", "")
    if "cpu" in str(platforms):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def barrier(name: str, timeout_s: float = 600.0) -> None:
    """Block until every process reaches this barrier.

    Uses the coordination service directly (NOT a device collective):
    gloo — the CPU collective fabric — creates one context per replica
    group lazily at that group's first collective with a hard ~30 s
    rendezvous timeout, so any cross-process skew longer than that (jit
    compile time being the usual offender) kills the job. Re-aligning the
    processes with this barrier right before the first execution of a
    freshly compiled program keeps the gloo rendezvous race down to
    execution skew (sub-second). On real TPU pods ICI setup has no such
    race and this is just a cheap sync.
    """
    from jax._src import distributed

    client = distributed.global_state.client
    assert client is not None, "barrier() requires initialize() first"
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def is_multihost() -> bool:
    return jax.process_count() > 1


_WARM_CALLS = 0


def warm_collectives(mesh: Mesh) -> None:
    """Initialize the collective fabric's context for this mesh's device
    group NOW, while all processes are in lockstep.

    Gloo (the CPU fabric) creates one context per replica group, lazily at
    the group's first collective, with a ~30 s rendezvous timeout. The
    first real collective sits after minutes of jit compilation whose
    duration can skew across processes (e.g. one process hits a compile
    cache the other just filled — including this warm program's own
    compile), so the lazy init loses the race. So: compile the warm
    all-reduce FIRST, re-align every process at a coordination-service
    barrier (which has a generous timeout), and only then execute —
    the gloo rendezvous then races only sub-second execution skew. The
    contexts it creates are reused by every later psum/all-gather on
    this mesh. No-op cost on TPU (ICI has no rendezvous race).
    """
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    n = mesh.devices.size
    local = np.zeros((max(n // jax.process_count(), 1),), np.float32)
    x = jax.make_array_from_process_local_data(sharding, local)
    compiled = jax.jit(
        lambda v: v.sum(), out_shardings=NamedSharding(mesh, P())
    ).lower(x).compile()
    if is_multihost():
        # unique barrier id per call: the coordination service may reject
        # a re-used (already-passed) id, and one process can legitimately
        # warm several meshes of the same shape in one lifetime
        global _WARM_CALLS
        _WARM_CALLS += 1
        barrier(f"phnet-warm-{'x'.join(map(str, mesh.devices.shape))}"
                f"-{_WARM_CALLS}")
    compiled(x).block_until_ready()


def host_local_to_global(x, sharding: NamedSharding):
    """Lift a value every process holds IN FULL (params, optimizer state,
    RNG key data) onto a global sharding that may span non-addressable
    devices. ``jax.device_put`` refuses non-addressable shardings; the
    callback form serves each local shard from the full local copy, so it
    works for replicated and tensor-sharded placements alike."""
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


def global_tree(tree, shardings):
    """Map :func:`host_local_to_global` over a pytree of (value, sharding)
    pairs — e.g. params with their ``shard_params`` placements."""
    return jax.tree.map(host_local_to_global, tree, shardings)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (identical on every process) over all hosts."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: host_local_to_global(x, rep), tree)


def global_key(mesh: Mesh, key):
    """Replicate a PRNG key (same on every process) across hosts. Typed
    key arrays can't go through numpy, so round-trip the raw key data —
    preserving the key's PRNG impl (e.g. 'rbg', the partitionable impl
    recommended multi-host; the default wrap would assume threefry)."""
    data = host_local_to_global(
        jax.random.key_data(key), NamedSharding(mesh, P()))
    return jax.random.wrap_key_data(data, impl=jax.random.key_impl(key))


def global_batch(mesh: Mesh, local_arr, spec: P = P("data")):
    """Assemble a global data-sharded array from this process's local slice.

    ``local_arr``'s leading axis is this host's share of the global batch
    (global = local * process_count along the sharded axis); the returned
    ``jax.Array`` spans all hosts' devices without any host ever holding
    the full batch — the DistributedSampler+DDP data flow, minus the
    gather.
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_arr)
