"""Multi-host (DCN) bring-up: ``jax.distributed`` wiring + global data path.

The reference is strictly single-process (SURVEY.md §2.5); this module adds
the standard JAX multi-controller path: every host runs the same program,
``initialize_distributed`` joins them into one cluster, meshes are built
over the GLOBAL device list, and per-host input shards become global arrays
via ``jax.make_array_from_process_local_data``. Model/optimizer math is
unchanged — GSPMD inserts the cross-host collectives (DP gradient psum over
DCN, everything else over ICI).

Verified by a real 2-process CPU cluster test (gloo collectives):
``tests/test_parallel.py::test_two_process_dp_matches_single_process``.

On TPU pods, ``jax.distributed.initialize()`` with no arguments picks up
the cluster from the TPU metadata; on CPU/manual clusters pass coordinator
address / process count / process id (or set ``JAX_COORDINATOR_ADDRESS``,
``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join (or no-op) the multi-process cluster. Returns True when running
    multi-process after the call.

    Safe to call unconditionally: single-process (no coordinator anywhere)
    is a no-op, and double-initialization is ignored.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # NOTE: nothing before jax.distributed.initialize may touch a backend
    # (jax.devices()/default_backend() would freeze a single-process world),
    # so platform checks read configuration only.
    platforms = str(jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", ""))

    if coordinator_address is None and num_processes is None:
        # TPU pods auto-discover via metadata; anywhere else this is a
        # single-process run and initialize() would fail — skip.
        if os.environ.get("TPU_WORKER_HOSTNAMES"):
            jax.distributed.initialize()
            _INITIALIZED = True
            return jax.process_count() > 1
        return False

    if num_processes is not None and num_processes <= 1:
        return False

    # CPU backends need an explicit cross-process collectives implementation.
    if platforms.startswith("cpu"):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jaxlib: option absent, mpi-only builds
            pass

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return jax.process_count() > 1


def shard_host_batch_global(mesh, *arrays):
    """Per-process host batch shards -> global batch-sharded jax.Arrays.

    Each process passes ITS slice of the global batch (equal sizes); the
    result is one global array with the leading dim sharded over ``data``
    across all hosts — the multi-host analogue of ``shard_batch``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    out = tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a)) for a in arrays
    )
    return out if len(out) > 1 else out[0]


def replicate_global(mesh, tree):
    """Replicate identical per-process host values over the global mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)), tree
    )
