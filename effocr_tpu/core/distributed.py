"""Multi-host initialization.

The reference's multi-machine story is detectron2.engine.launch over
torch.distributed/NCCL (train_effocr_localizer_d2.py:258-265).  The JAX
equivalent: every host runs the same program, jax.distributed.initialize
wires the hosts into one runtime, and the global mesh spans all devices —
the same pjit train step then runs SPMD with gradient all-reduce over
ICI within a slice and DCN across slices.  No per-rank code.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the distributed runtime when running on more than one
    host.  On TPU pods the arguments are auto-detected from the
    environment; pass them explicitly elsewhere (the analogue of
    detectron2 launch()'s dist_url/machine_rank).  Safe to call on a
    single host (no-op)."""
    if num_processes is None and coordinator_address is None:
        # single-process unless the TPU/cluster env says otherwise
        in_pod = any(
            k in os.environ
            for k in ("MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")
        )
        if not in_pod or len(os.environ.get(
                "TPU_WORKER_HOSTNAMES", "localhost").split(",")) <= 1:
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(model: int = 1):
    """Mesh over every device in the (possibly multi-host) job."""
    from effocr_tpu.core.mesh import make_mesh

    return make_mesh(jax.devices(), model=model)


def is_primary() -> bool:
    return jax.process_index() == 0
