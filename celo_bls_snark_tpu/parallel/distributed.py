"""Multi-host bring-up for pod-slice deployments (SURVEY.md §5
"distributed backend").

The reference is single-host (rayon threads only); a TPU pod slice runs
one process per host, each seeing its local chips, with XLA collectives
riding ICI within the slice. This module is the process bring-up:

  init_distributed()  -- jax.distributed.initialize for multi-process runs
                         (no-op for the 1-process case so the same entry
                         point serves dev boxes and pods);
  global_mesh()       -- a 1-D mesh over ALL devices in the job (local +
                         remote), the mesh every parallel/mesh.py entry
                         point accepts. On a pod slice the axis order keeps
                         each host's chips contiguous so batch shards stay
                         host-local and collectives ride ICI, not DCN.

Tested single-process on the 8-device virtual CPU mesh
(tests/test_parallel.py); multi-process paths take their parameters from
the standard TPU env (megascale coordinator) or explicit arguments.
"""

import jax

from .mesh import make_mesh


_INITIALIZED = False


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Bring up the JAX distributed runtime.

    With no arguments on TPU pod hardware, jax.distributed.initialize
    autodetects everything from the TPU metadata; single-process runs
    (num_processes in (None on CPU, 1)) skip initialization entirely so
    unit tests and dev boxes need no coordinator.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    if num_processes in (0, 1):
        _INITIALIZED = True
        return
    # jax.distributed.initialize must run before the XLA backend comes up,
    # so the platform is read from config (jax.default_backend() would
    # initialize the backend and poison the call below)
    plat = (jax.config.jax_platforms or "").split(",")[0]
    if coordinator_address is None and plat == "cpu":
        # nothing to coordinate on a dev box
        _INITIALIZED = True
        return
    if plat == "cpu":
        # cross-process collectives on the CPU backend need an explicit
        # transport; gloo ships in jaxlib (tests/test_distributed_mp.py
        # drives a real 2-process mesh through this path)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True


def global_mesh(axis=None):
    """1-D mesh over every device in the job, host-contiguous order."""
    from ..utils.config import get_config

    axis = axis or get_config().mesh_axis
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return make_mesh(devs, axis=axis)


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0
