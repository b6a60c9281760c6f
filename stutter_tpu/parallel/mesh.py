"""Device mesh + sharding strategy (SURVEY.md §2 E6/E7).

The reference has NO distributed backend — one ``cuda:N``/``cpu`` device,
multi-GPU only by launching the script twice (``WavLM_embeddings.py:442-446``).
The TPU build makes scaling first-class the JAX way: a global mesh over ICI,
data-parallel batch sharding via ``NamedSharding``/``pjit``, and XLA
collectives for reductions. No NCCL/MPI-style transport exists or is needed.

Parallelism scope (stated, per SURVEY.md §2 E7): DP is the strategy this
workload needs (clips are independent; sequences are bounded at 1500 frames /
30 s). TP over the model axis is provided as an optional scale-out axis for
the 1024/1280-wide encoders. PP/EP/CP/sequence-parallelism are intentionally
not applicable — sequence length is bounded by design (Whisper pad/trim;
WavLM ``--max_length`` trim / chunking), so there is nothing for ring
attention to win.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    """A mesh plus the sharding specs the extraction/training stack uses."""

    mesh: Mesh

    @property
    def data_size(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def model_size(self) -> int:
        return self.mesh.shape.get(MODEL_AXIS, 1)

    def batch_sharding(self, ndim: int = 2, axis: int = 0) -> NamedSharding:
        """Shard the batch axis (``axis``) over the data axis.

        ``axis=1`` serves gradient accumulation's [K, B, ...] stacks: the
        microbatch axis K is scanned sequentially on every device while B
        stays data-parallel."""
        spec = [None] * ndim
        spec[axis] = DATA_AXIS
        return NamedSharding(self.mesh, P(*spec))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def pad_batch(self, n: int) -> int:
        """Round a batch size up to a multiple of the data-axis size."""
        d = self.data_size
        return ((n + d - 1) // d) * d


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up: one call per host before building the mesh.

    Wraps ``jax.distributed.initialize`` (auto-detecting on TPU pods);
    afterwards ``jax.devices()`` spans all hosts and the same ``make_mesh``
    code runs global-SPMD — cross-host traffic rides DCN transparently via
    XLA collectives (SURVEY.md §5 "distributed communication backend").
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    devices: list | None = None,
    data: int | None = None,
    model: int = 1,
) -> MeshPlan:
    """Build a [data, model] mesh over the available devices.

    Defaults to pure DP over every device (the right layout for embedding
    extraction: weights replicated over ICI neighbors, clip batch split).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return MeshPlan(mesh=Mesh(dev_array, (DATA_AXIS, MODEL_AXIS)))


def shard_batch(plan: MeshPlan | None, *arrays, axis: int = 0):
    """Place host arrays on device, batch axis sharded over the data axis."""
    if plan is None:
        out = tuple(jax.device_put(a) for a in arrays)
    else:
        out = tuple(
            jax.device_put(a, plan.batch_sharding(np.ndim(a), axis=axis))
            for a in arrays
        )
    return out if len(out) > 1 else out[0]


def replicate(plan: MeshPlan | None, tree):
    """Replicate a param pytree across the mesh (or just device_put)."""
    if plan is None:
        return jax.device_put(tree)
    return jax.device_put(tree, plan.replicated())
