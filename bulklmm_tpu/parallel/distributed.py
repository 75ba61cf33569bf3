"""Multi-host (pod) support.

The reference explicitly defers multi-machine distribution to future work
(reference README.md:66-72). Here a pod run is:

  1. ``init_distributed()`` on every host (jax.distributed handshake);
  2. build one global mesh with :func:`bulklmm_tpu.parallel.make_mesh`
     (jax.devices() is then the global device list);
  3. each host feeds its local trait block; results stay sharded — write
     per-shard outputs rather than gathering the (p x m) LOD matrix.

Trait sharding is embarrassingly parallel: the only cross-host traffic is
eigen-factor replication (n x n, tiny) and any final reductions
(per-permutation maxima via max-``psum``), which ride ICI/DCN collectives.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize JAX's multi-host runtime; returns this process's index.

    No-ops when already initialized or when running single-process (so the
    same launcher script works on one host and on a pod).
    """
    if jax.process_count() > 1:
        return jax.process_index()
    if coordinator_address is None and num_processes in (None, 1):
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def local_trait_slice(m_total: int) -> slice:
    """The trait columns this host owns under even trait sharding."""
    nproc = jax.process_count()
    pid = jax.process_index()
    per = -(-m_total // nproc)
    return slice(pid * per, min((pid + 1) * per, m_total))
