"""Worker for the 2-process jax.distributed CPU smoke (SURVEY.md §2b E6).

Run by tests/test_distributed.py as::

    python tests/distributed_worker.py <coordinator_port> <process_id> <nprocs>

Each process owns ONE CPU device; ``init_distributed`` brings up the TCP
coordinator, after which ``jax.devices()`` spans both processes and the
ordinary mesh code runs global-SPMD. The work is deliberately tiny (a psum
and a 2-clip tiny-WavLM DP extraction) — the point is executing the
multi-process seam itself, which the virtual 8-device single-process mesh
tests cannot reach.

Prints ``DIST_OK <psum> <cosine>`` on success; any mismatch asserts.
"""

from __future__ import annotations

import sys


def main() -> int:
    port, pid, nprocs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import jax

    # force CPU before any backend spins up (the axon TPU plugin registers at
    # interpreter start; JAX_PLATFORMS env alone is ignored — CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

    from stutter_tpu.parallel.mesh import DATA_AXIS, init_distributed, make_mesh

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == nprocs, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    plan = make_mesh()  # pure DP over the two cross-process devices

    # --- collective smoke: psum over the data axis -------------------------
    local = np.asarray([float(pid + 1)], np.float32)  # process p holds p+1
    global_x = jax.make_array_from_single_device_arrays(
        (nprocs,),
        plan.batch_sharding(ndim=1),
        [jax.device_put(local, jax.local_devices()[0])],
    )
    psum = jax.jit(
        jax.shard_map(
            lambda x: jax.lax.psum(jnp.sum(x), DATA_AXIS),
            mesh=plan.mesh,
            in_specs=P(DATA_AXIS),
            out_specs=P(),
        )
    )(global_x)
    expected = nprocs * (nprocs + 1) / 2.0
    assert float(psum) == expected, (float(psum), expected)

    # --- DP extraction equality: sharded 2-clip batch == local compute -----
    from stutter_tpu.models import WavLMConfig, init_wavlm_params, wavlm_encode

    cfg = WavLMConfig.tiny()
    params = init_wavlm_params(jax.random.key(0), cfg)
    n = 2400  # 0.15 s; the tiny 3-conv stem only downsamples 20x (CLAUDE.md)
    rs = np.random.RandomState(7)
    waves = (rs.randn(nprocs, n) * 0.1).astype(np.float32)  # same on all procs
    lengths = np.full((nprocs,), n, np.int32)

    def encode(p, w, l):
        return wavlm_encode(p, w, cfg, (cfg.num_hidden_layers,), sample_lengths=l)

    # global batch sharded one clip per process; output replicated so every
    # process can fetch and compare against its own single-device compute
    gw = jax.make_array_from_single_device_arrays(
        waves.shape,
        plan.batch_sharding(ndim=2),
        [jax.device_put(waves[pid : pid + 1], jax.local_devices()[0])],
    )
    gl = jax.make_array_from_single_device_arrays(
        lengths.shape,
        plan.batch_sharding(ndim=1),
        [jax.device_put(lengths[pid : pid + 1], jax.local_devices()[0])],
    )
    rep = NamedSharding(plan.mesh, P())
    pooled = jax.jit(encode, out_shardings=rep)(params, gw, gl)
    got = np.asarray(pooled.addressable_data(0))

    want = np.asarray(jax.jit(encode)(params, waves, lengths))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    u, v = got.reshape(-1), want.reshape(-1)
    cos = float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))

    print(f"DIST_OK {float(psum)} {cos:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
