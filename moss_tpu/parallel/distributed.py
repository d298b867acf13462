"""Multi-host runtime bootstrap: jax.distributed + global mesh construction.

The reference has no distributed backend at all (SURVEY.md §2.4/§5.8 — one
process, one GPU, CUDA atomics for all "communication"). The TPU-native
scaling design replaces that with the standard JAX multi-controller runtime:
every host runs the same driver, `initialize_distributed()` joins them through
the coordinator, and `jax.devices()` then spans the whole slice so one
('data', 'tile') mesh covers all chips. XLA emits the per-Gaussian gradient
psum over ICI within a slice / DCN across slices; no code in the training
step changes between 1 chip and N hosts (parallel/sharded.py).

Call order matters: initialize_distributed() must run before any other jax
API touches the backend (drivers call it first thing in main()).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join the multi-host runtime; returns True if initialization happened.

    With no arguments: initializes only when a cluster environment is
    auto-detectable (TPU pod metadata / JAX_COORDINATOR_ADDRESS env), else
    no-op — so single-host runs need no flags. With explicit arguments
    (driver flags --coordinator/--num_processes/--process_id): initializes
    unconditionally, mirroring jax.distributed.initialize's contract.
    """
    import jax

    explicit = coordinator_address is not None
    autodetect = (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES")  # multi-host TPU pod slice
    )
    if not explicit and not autodetect:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    return True


def assert_uniform_across_processes(value: int, what: str = "value") -> None:
    """Raise if `value` differs across the processes of a multi-controller
    run (no-op single-process).

    Used by Trainer.resume_latest: only process 0 writes checkpoints, so a
    per-host (non-shared) model_path would resolve different resume steps on
    different hosts — the processes would then issue different numbers of
    collective dispatches and the job hangs. An allgather + immediate error
    beats a silent desync."""
    import jax

    if jax.process_count() <= 1:
        return
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    vals = np.asarray(multihost_utils.process_allgather(jnp.asarray(int(value))))
    if int(vals.min()) != int(vals.max()):
        raise RuntimeError(
            f"{what} differs across processes: {vals.tolist()} — every "
            f"process must see the same files (shared storage; only process "
            f"0 writes)")


def global_mesh(n_data: int = 0, n_tile: int = 0):
    """A ('data', 'tile') mesh over ALL processes' devices.

    n_data/n_tile = 0 auto-factors: tile gets up to 4 chips (pixel bands are
    the cheap axis — only the band all-gather rides it), the rest go to data.
    On a multi-host mesh the device order from jax.devices() groups by
    process, so the 'data' axis lands across hosts (DCN carries only the
    per-Gaussian grad psum, ~10 MB — SURVEY §7) and 'tile' stays within a
    host's chips (ICI).
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devices = jax.devices()
    n = len(devices)
    if n_data == 0 and n_tile == 0:
        n_tile = next(t for t in (4, 2, 1) if n % t == 0 and t <= n)
        n_data = n // n_tile
    elif n_tile == 0:
        n_tile = n // n_data
    elif n_data == 0:
        n_data = n // n_tile
    assert n_data * n_tile <= n, (
        f"mesh {n_data}x{n_tile} needs {n_data * n_tile} devices, have {n}"
    )
    dev = np.array(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(dev, ("data", "tile"))
