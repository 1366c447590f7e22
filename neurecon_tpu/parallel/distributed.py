"""Multi-host process environment (reference utils/dist_util.py).

The reference initializes torch.distributed (NCCL) from torch.distributed.launch
or SLURM env vars. The TPU-native equivalent is `jax.distributed.initialize()`
on multi-host pods: afterwards `jax.devices()` spans the whole slice and the
single-program sharded step (neurecon_tpu/parallel/sharding.py) runs SPMD
across hosts — no other code changes.

Rank helpers mirror the reference API (get_rank / get_local_rank /
get_world_size / is_master) and also export NEURECON_RANK for the console
logger's master-only filter.
"""
from __future__ import annotations

import os

from neurecon_tpu.utils.console import log


def _env_int(*names, default=None):
    for n in names:
        v = os.environ.get(n)
        if v is not None:
            return int(v)
    return default


def init_env(args=None, seed: int = 42):
    """Initialize the (possibly multi-host) JAX runtime.

    Single-host: nothing to do — jax sees all local chips. Multi-host (env
    has a coordinator address, or SLURM variables): jax.distributed.initialize
    wires the hosts into one runtime.
    """
    import jax

    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_procs = _env_int("JAX_NUM_PROCESSES", "SLURM_NTASKS")
    proc_id = _env_int("JAX_PROCESS_ID", "SLURM_PROCID")

    if coordinator is None and "SLURM_NODELIST" in os.environ and num_procs \
            and num_procs > 1:
        # SLURM recipe (reference dist_util.py:42-70): first node is master
        nodelist = os.environ["SLURM_NODELIST"]
        first = nodelist.split(",")[0].split("-")[0].replace("[", "")
        port = os.environ.get("MASTER_PORT", "12355")
        coordinator = f"{first}:{port}"

    if coordinator is not None and num_procs and num_procs > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_procs,
                                   process_index=proc_id or 0)
        log.info(f"=> jax.distributed initialized: process {proc_id}/{num_procs}"
                 f" @ {coordinator}; {jax.device_count()} global devices")

    os.environ["NEURECON_RANK"] = str(get_rank())
    return get_rank(), get_local_rank(), get_world_size()


def get_rank() -> int:
    import jax
    return jax.process_index()


def get_local_rank() -> int:
    # one python process drives all local chips: local rank == process rank
    return get_rank()


def get_world_size() -> int:
    import jax
    return jax.process_count()


def is_master() -> bool:
    return get_rank() == 0
