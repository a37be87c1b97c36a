"""Multi-host scaffolding tests (parallel/multihost.py).

Single-process: the (hosts, chips) mesh degenerates to (1, n) and the
multi-host grid solve must match the single-device solve. Two-process: a
real ``jax.distributed`` CPU cluster (2 processes x 2 virtual devices) runs
the same solve over a genuine (2, 2) mesh — the DCN-axis code path — and
must reproduce the single-process cost.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from deeparc_tpu.config import SolverOptions
from deeparc_tpu.io.synthetic import make_hemisphere_rig
from deeparc_tpu.scene import freeze_masks, from_deeparc
from deeparc_tpu.solver.rig_grid import grid_from_scene, solve_ba_grid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _problem():
    rig = make_hemisphere_rig(
        n_arc=3, n_ring=4, n_points=64, pixel_noise=0.3, point_noise=0.02,
        seed=11,
    )
    scene = from_deeparc(rig.data)
    return scene, freeze_masks(scene)


def test_make_host_mesh_single_process():
    from deeparc_tpu.parallel.multihost import make_host_mesh

    mesh = make_host_mesh()
    assert mesh.devices.shape[0] == 1          # one process
    assert mesh.devices.shape[1] == 8          # virtual CPU devices
    assert mesh.axis_names == ("host", "chip")


def test_multihost_solve_matches_single_device():
    from deeparc_tpu.parallel.multihost import (
        make_host_mesh, solve_ba_grid_multihost,
    )

    scene, free = _problem()
    grid = grid_from_scene(scene)
    opts = SolverOptions(max_iterations=4)
    single = solve_ba_grid(scene.params, grid, free, opts,
                           driver="while_loop", chunk_size=16)
    multi = solve_ba_grid_multihost(scene.params, grid, free, opts,
                                    mesh=make_host_mesh(), chunk_size=16)
    np.testing.assert_allclose(float(multi.cost), float(single.cost),
                               rtol=1e-9)
    assert multi.iterations == single.iterations


_WORKER = r"""
import os, sys
sys.path.insert(0, os.getcwd())
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4

import json
import numpy as np
from deeparc_tpu.config import SolverOptions
from deeparc_tpu.io.synthetic import make_hemisphere_rig
from deeparc_tpu.parallel.multihost import make_host_mesh, solve_ba_grid_multihost
from deeparc_tpu.scene import freeze_masks, from_deeparc
from deeparc_tpu.solver.rig_grid import grid_from_scene

rig = make_hemisphere_rig(n_arc=3, n_ring=4, n_points=64, pixel_noise=0.3,
                          point_noise=0.02, seed=11)
scene = from_deeparc(rig.data)
free = freeze_masks(scene)
grid = grid_from_scene(scene)
mesh = make_host_mesh()
assert mesh.devices.shape == (2, 2), mesh.devices.shape
out = solve_ba_grid_multihost(scene.params, grid, free,
                              SolverOptions(max_iterations=4),
                              mesh=mesh, chunk_size=16)
if pid == 0:
    print("RESULT " + json.dumps({"cost": out.cost, "k": out.iterations}))
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_distributed_solve(tmp_path):
    scene, free = _problem()
    grid = grid_from_scene(scene)
    single = solve_ba_grid(scene.params, grid, free,
                           SolverOptions(max_iterations=4),
                           driver="while_loop", chunk_size=16)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-2000:]}"
    result_line = [ln for ln in outs[0][1].splitlines()
                   if ln.startswith("RESULT ")]
    assert result_line, outs[0][1]
    result = json.loads(result_line[0][len("RESULT "):])
    np.testing.assert_allclose(result["cost"], float(single.cost), rtol=1e-9)
    assert result["k"] == single.iterations
