"""Multi-host execution: jax.distributed startup, (hosts, chips) meshes,
host-local data loading, and the multi-host grid solve.

The reference has no distributed capability (its only parallelism is Ceres'
thread pool, ``src/sfm.cc:70``); this module is the new capability mandated
by BASELINE.json (>= 75% scaling efficiency at >= 2 hosts) and SURVEY.md
section 7 stage 7. Design:

  * one ``jax.distributed.initialize`` call per process (coordinator from
    args or the standard env vars), after which ``jax.devices()`` is global;
  * a 2-D ``Mesh`` shaped (hosts, chips-per-host): point-major arrays shard
    over BOTH axes (pure data parallelism over point rows), and the reduced
    camera system's psums run over the ("host", "chip") axis pair — XLA
    routes the intra-host part over ICI and the cross-host part over DCN;
  * host-local loading: each process materializes only its slice of the
    point-major arrays and assembles the global sharded array with
    ``jax.make_array_from_process_local_data`` — no host ever holds the
    whole problem.

On a single process this degenerates to a (1, n_devices) mesh and is
exercised by tests on the virtual CPU mesh; the 2-process CPU path is
covered by tests/test_multihost.py via subprocesses.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

HOST_AXIS = "host"
CHIP_AXIS = "chip"


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed if a multi-process setup is configured.

    Explicit args win; otherwise the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a
    TPU-pod environment where initialize() autodetects) are used. Returns
    True when distributed mode is active.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_host_mesh(devices=None) -> Mesh:
    """(hosts, chips-per-host) mesh over all global devices.

    Rows are processes (DCN axis), columns the process-local devices (ICI
    axis). Single-process: a (1, n) mesh — the same code path everywhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    by_proc = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)
    n_local = {len(v) for v in by_proc.values()}
    if len(n_local) != 1:
        raise ValueError(
            f"uneven devices per process: { {k: len(v) for k, v in by_proc.items()} }")
    rows = [by_proc[k] for k in sorted(by_proc)]
    return Mesh(np.asarray(rows), (HOST_AXIS, CHIP_AXIS))


def data_axes() -> tuple:
    """The axis pair point-major arrays shard over (psum over both)."""
    return (HOST_AXIS, CHIP_AXIS)


def host_point_slice(n_rows_padded: int, mesh: Mesh) -> slice:
    """The global point-row range THIS process must load.

    Point rows are sharded row-major over (hosts, chips); a process owns the
    contiguous block of its mesh row.
    """
    n_hosts = mesh.devices.shape[0]
    assert n_rows_padded % (n_hosts * mesh.devices.shape[1]) == 0
    per_host = n_rows_padded // n_hosts
    h = jax.process_index()
    return slice(h * per_host, (h + 1) * per_host)


def global_from_host_local(local: np.ndarray, mesh: Mesh,
                           n_global: int) -> jax.Array:
    """Assemble a globally point-sharded array from this host's slice."""
    sharding = NamedSharding(mesh, P(data_axes()))
    shape = (n_global,) + local.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local, shape)


def pad_rows_to_mesh(n_rows: int, mesh: Mesh) -> int:
    n_dev = int(mesh.devices.size)
    return -(-n_rows // n_dev) * n_dev


def solve_ba_grid_multihost(
    params,
    grid,
    free,
    options=None,
    mesh: Mesh | None = None,
    chunk_size: int = 8192,
    impl: str = "planes",
):
    """Grid-engine LM solve SPMD over a (hosts, chips) mesh.

    Identical math to ``sharded_grid.solve_ba_grid_sharded`` — the step's
    cross-point reductions psum over the ("host", "chip") axis PAIR, so the
    camera system reduces over ICI within a host and DCN across hosts.
    """
    from jax import shard_map

    from deeparc_tpu.config import SolverOptions
    from deeparc_tpu.parallel.sharded_grid import shard_grid_rows
    from deeparc_tpu.residuals.reprojection import flatten_camera
    from deeparc_tpu.solver.ba import BAResult
    from deeparc_tpu.solver.rig_grid import (
        GridIndex, _params_from, init_grid_state, make_grid_step,
    )

    options = options or SolverOptions()
    if mesh is None:
        mesh = make_host_mesh()
    n_shards = int(mesh.devices.size)
    axes = data_axes()

    cam_free = flatten_camera(free)
    params_p, grid_p, point_free_p, N = shard_grid_rows(
        params, grid, free.points, n_shards)

    step = make_grid_step(options, params_p, chunk_size, impl=impl,
                          axis=axes)

    sharded_fields = {"xy0", "xy1", "mask", "point_mask"}

    def spmd(points, xy0, xy1, mask, point_mask, point_free, cam_tables,
             cam_free):
        g = GridIndex(xy0=xy0, xy1=xy1, mask=mask, point_mask=point_mask,
                      **{f: getattr(cam_tables["grid"], f)
                         for f in GridIndex._fields
                         if f not in sharded_fields})
        p = dataclasses.replace(cam_tables["params"], points=points)
        state = init_grid_state(p, g, options, axis=axes, impl=impl)
        final = jax.lax.while_loop(
            lambda st: (st.status == 0) & (st.k < options.max_iterations),
            lambda st: step(st, g, cam_free, point_free)[0],
            state,
        )
        return (final.points, final.cam_vec, final.cost, final.k,
                final.status)

    import jax.numpy as jnp

    rep_grid = grid_p._replace(
        xy0=jnp.zeros((0,) + grid_p.xy0.shape[1:], grid_p.xy0.dtype),
        xy1=jnp.zeros((0,) + grid_p.xy1.shape[1:], grid_p.xy1.dtype),
        mask=jnp.zeros((0,) + grid_p.mask.shape[1:], grid_p.mask.dtype),
        point_mask=jnp.zeros((0,), grid_p.point_mask.dtype),
    )
    cam_tables = {"grid": rep_grid, "params": params_p}

    fn = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes), P(axes), P(axes), P(axes),
                  jax.tree.map(lambda _: P(), cam_tables), P()),
        out_specs=(P(axes), P(), P(), P(), P()),
    )
    points_f, cam_f, cost_f, k_f, status_f = jax.jit(fn)(
        params_p.points, grid_p.xy0, grid_p.xy1, grid_p.mask,
        grid_p.point_mask, point_free_p, cam_tables, cam_free,
    )
    out_params = _params_from(cam_f, points_f[:N], params)
    return BAResult(
        params=out_params, cost=float(cost_f),
        iterations=int(k_f), status=int(status_f),
    )
