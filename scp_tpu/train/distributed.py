"""Multi-host (DCN) initialization for the data-parallel trainer.

SURVEY §2.6's TPU-native mapping: one process per host, chips connected
by ICI within a host/slice and DCN across hosts; `jax.distributed
.initialize()` wires the processes into one JAX runtime whose
`jax.devices()` spans every chip, after which the existing Mesh("data")
trainer scales with NO algorithm change — XLA emits gradient psums over
ICI within a slice and DCN across (reference equivalent: Lightning
DDP's implicit multi-node NCCL, reference train.py:42-52).

Recipe (documented for a v5e pod slice or any multi-host fleet):

  # TPU pods — every host runs the same command; coordinates are
  # auto-detected from the TPU metadata:
  SCP_MULTIHOST=1 python -m scp_tpu.cli.train --config-name ...

  # explicit coordinates (CPU/GPU clusters, manual TPU bring-up):
  SCP_COORDINATOR=host0:8476 SCP_NUM_PROCESSES=4 SCP_PROCESS_ID=$i \
      python -m scp_tpu.cli.train --config-name ...

`cfg.data.batch_size` stays the GLOBAL batch: the CLI divides it by
`jax.process_count()`, each process's ShardDataset draws a disjoint
slice of every global batch (process-strided, so the global batch
content is independent of the process count), and the trainer assembles
the global device array with `jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import os


def maybe_initialize(env=os.environ) -> int:
    """Initialize jax.distributed when multi-host env is configured.

    Must run before any other JAX call (it changes the device topology).
    Returns the process index (0 when single-process / not configured).
    """
    import jax

    coord = env.get("SCP_COORDINATOR")
    if not coord and not env.get("SCP_MULTIHOST"):
        return 0
    kwargs = {}
    if coord:
        kwargs = dict(
            coordinator_address=coord,
            num_processes=int(env["SCP_NUM_PROCESSES"]),
            process_id=int(env["SCP_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    return jax.process_index()


def put_global(batch: dict, sharding):
    """Host-local batch rows -> global device array under `sharding`.

    Single-process: a plain device_put.  Multi-process: every process
    contributes its local rows of the batch axis
    (jax.make_array_from_process_local_data stitches them into one
    global array laid out by `sharding`)."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }
