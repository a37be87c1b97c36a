"""Bundle-adjustment driver: LM trust region over the Schur-eliminated scene.

The native replacement for the reference's ``solve()``
(``src/sfm.cc:31-75``): where that assembles a ``ceres::Problem`` block by
block and calls ``ceres::Solve`` (DENSE_SCHUR, <=100 iterations, 3600 s cap,
progress to stdout), this jit-compiles ONE step function — linearize
(vmap-jacfwd) -> Schur solve -> trial evaluation -> trust-region update — and
drives it either from Python (per-iteration Ceres-style progress lines +
wall-clock budget, like ``minimizer_progress_to_stdout``) or fully on-device
in a ``lax.while_loop`` (zero host round-trips; the bench/entry path).

Status codes: 0 running/max-iter, 2 function-tol, 3 gradient-tol,
4 parameter-tol, 5 trust region collapsed.
"""

from __future__ import annotations

import dataclasses
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp

from deeparc_tpu.config import SolverOptions
from deeparc_tpu.residuals.reprojection import (
    FlatObsJacobians,
    flatten_camera,
    jacobian_blocks_flat,
    residuals as residuals_fn,
    unflatten_camera,
)
from deeparc_tpu.scene import BAParams, SceneIndex
from deeparc_tpu.solver import trust_region as tr_mod
from deeparc_tpu.solver.loss import rho as loss_rho, weight as loss_weight
from deeparc_tpu.solver.schur import (
    build_system, j_times, solve_schur, sys_r,
)


def robust_cost(params, index, options: SolverOptions):
    """0.5 * sum rho(||r||^2) — the robustified objective (== plain cost for
    the trivial loss, the reference's NULL loss at sfm.cc:48)."""
    r = residuals_fn(params, index)
    s = jnp.sum(r * r, axis=-1)
    return 0.5 * jnp.sum(loss_rho(s, options.loss, options.loss_scale))


class BAState(NamedTuple):
    params: BAParams
    cost: jnp.ndarray
    tr: tr_mod.TRState
    k: jnp.ndarray
    status: jnp.ndarray


class StepInfo(NamedTuple):
    cost: jnp.ndarray
    cost_change: jnp.ndarray
    grad_max: jnp.ndarray
    step_norm: jnp.ndarray
    radius: jnp.ndarray
    rho: jnp.ndarray
    accepted: jnp.ndarray
    # PCG iterations the linear solve actually used (iterative engines
    # under a real cg_tolerance; -1 where not applicable)
    cg_iters: jnp.ndarray | int = -1


class BAResult(NamedTuple):
    params: BAParams
    cost: jnp.ndarray
    iterations: int
    status: int


def _apply_step(params: BAParams, dp: jnp.ndarray, dc: jnp.ndarray) -> BAParams:
    cam = flatten_camera(params) + dc
    out = unflatten_camera(cam, params)
    return dataclasses.replace(out, points=params.points + dp)


def make_step_pure(options: SolverOptions):
    """Build the LM step as a PURE function
    ``step(state, index, cam_free, point_free) -> (BAState, StepInfo)``.

    The scene index and freeze masks are arguments, not closures: closed-over
    arrays would be embedded as HLO constants, bloating the executable and
    (through the remote-compile tunnel) multiplying compile time by the size
    of the observation arrays. Passing them keeps the compiled program
    shape-parameterized and the data device-resident.
    """

    def step(state: BAState, index: SceneIndex, cam_free, point_free):
        n_points = point_free.shape[0]
        params = state.params
        blocks = jacobian_blocks_flat(params, index)
        if options.loss != "trivial":
            s = jnp.sum(blocks.r * blocks.r, axis=-1)
            w = loss_weight(s, options.loss, options.loss_scale)
            blocks = FlatObsJacobians(
                r=blocks.r * w[:, None],
                jp=blocks.jp * w[:, None],
                jc=blocks.jc * w[:, None],
            )
        sys = build_system(
            blocks.r, blocks.jp, blocks.jc, index,
            n_points, params.ext_rot.shape[0], params.center.shape[0],
            cam_free, point_free,
        )
        dp, dc = solve_schur(sys, state.tr.radius, options)
        j_dx = j_times(sys, dp, dc)
        mcc = tr_mod.model_cost_change(j_dx, sys_r(sys))

        trial = _apply_step(params, dp, dc)
        new_cost = robust_cost(trial, index, options)
        rho = (state.cost - new_cost) / jnp.maximum(mcc, 1e-300)
        accept = (mcc > 0) & (rho > options.min_relative_decrease)

        tr_next = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b),
            tr_mod.step_accepted(state.tr, rho, options.max_radius),
            tr_mod.step_rejected(state.tr),
        )
        params_next = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), trial, params
        )
        cost_next = jnp.where(accept, new_cost, state.cost)

        grad_max = jnp.maximum(
            jnp.max(jnp.abs(sys.g_c)), jnp.max(jnp.abs(sys.g_p))
        )
        step_norm = jnp.sqrt(jnp.vdot(dp, dp) + jnp.vdot(dc, dc))
        x_norm = jnp.sqrt(
            jnp.vdot(params.points, params.points)
            + jnp.vdot(flatten_camera(params), flatten_camera(params))
        )
        cost_change = state.cost - new_cost
        ftol = accept & (
            jnp.abs(cost_change) <= options.function_tolerance * state.cost
        )
        ptol = accept & (
            step_norm
            <= options.parameter_tolerance
            * (x_norm + options.parameter_tolerance)
        )
        gtol = grad_max <= options.gradient_tolerance
        radius_min = tr_next.radius <= options.min_radius
        status = jnp.where(
            gtol, 3,
            jnp.where(ftol, 2, jnp.where(ptol, 4, jnp.where(radius_min, 5, 0))),
        )
        next_state = BAState(
            params=params_next, cost=cost_next, tr=tr_next,
            k=state.k + 1, status=jnp.asarray(status),
        )
        info = StepInfo(
            cost=cost_next, cost_change=cost_change, grad_max=grad_max,
            step_norm=step_norm, radius=state.tr.radius, rho=rho,
            accepted=accept,
        )
        return next_state, info

    return step


def make_step(index: SceneIndex, free: BAParams, options: SolverOptions):
    """Compatibility wrapper closing over (index, masks); prefer
    make_step_pure + explicit arguments at jit boundaries."""
    step = make_step_pure(options)
    cam_free = flatten_camera(free)
    point_free = free.points
    return lambda state: step(state, index, cam_free, point_free)


def init_state(
    params: BAParams, index: SceneIndex, options: SolverOptions
) -> BAState:
    dtype = params.points.dtype
    return BAState(
        params=params,
        cost=robust_cost(params, index, options),
        tr=tr_mod.init_tr(options.initial_radius, dtype),
        k=jnp.asarray(0),
        status=jnp.asarray(0),
    )


def solve_ba(
    params: BAParams,
    index: SceneIndex,
    free: BAParams,
    options: SolverOptions = SolverOptions(),
    driver: str = "python",
    checkpoint_path: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
    logger=None,
) -> BAResult:
    """Run LM to convergence.

    driver='python': step-per-dispatch with Ceres-style progress printing and
      the wall-clock cap (``max_solver_time_in_seconds``, sfm.cc:71);
      supports periodic solver-state checkpoints (resume=True restarts from
      checkpoint_path with the saved trust-region state) and a JsonlLogger.
    driver='while_loop': the whole solve is one device computation (no
      per-iteration host sync; used by benchmarks and the multi-chip path).
    """
    step = make_step_pure(options)
    cam_free = flatten_camera(free)
    point_free = free.points

    if driver == "while_loop":
        jit_solve = jax.jit(
            lambda s, idx, cf, pf: jax.lax.while_loop(
                lambda st: (st.status == 0) & (st.k < options.max_iterations),
                lambda st: step(st, idx, cf, pf)[0],
                s,
            )
        )
        final = jit_solve(
            init_state(params, index, options), index, cam_free, point_free
        )
        return BAResult(
            params=final.params, cost=final.cost,
            iterations=int(final.k), status=int(final.status),
        )

    jit_step = jax.jit(step)
    state = init_state(params, index, options)
    start_iter = 0
    if resume and checkpoint_path:
        import os

        if os.path.exists(checkpoint_path):
            from deeparc_tpu.utils.checkpoint import load_solver_state

            ck_params, scal = load_solver_state(
                checkpoint_path, dtype=params.points.dtype
            )
            state = BAState(
                params=ck_params,
                cost=robust_cost(ck_params, index, options),
                tr=tr_mod.TRState(
                    radius=jnp.asarray(scal["radius"], params.points.dtype),
                    decrease_factor=jnp.asarray(
                        scal["decrease_factor"], params.points.dtype
                    ),
                ),
                k=jnp.asarray(scal["iteration"]),
                status=jnp.asarray(0),
            )
            start_iter = scal["iteration"]
    t0 = time.time()
    if options.progress_to_stdout:
        print(
            f"{'iter':>4} {'cost':>14} {'cost_change':>12} {'|gradient|':>11}"
            f" {'tr_radius':>10} {'rho':>9} {'accept':>6}"
        )
        print(f"{0:>4} {float(state.cost):>14.6e}")
    k = start_iter
    while int(state.status) == 0 and k < options.max_iterations:
        if time.time() - t0 > options.max_seconds:
            break
        state, info = jit_step(state, index, cam_free, point_free)
        k += 1
        if options.progress_to_stdout:
            print(
                f"{k:>4} {float(info.cost):>14.6e}"
                f" {float(info.cost_change):>12.4e}"
                f" {float(info.grad_max):>11.4e}"
                f" {float(info.radius):>10.3e} {float(info.rho):>9.3f}"
                f" {bool(info.accepted)!s:>6}"
            )
        if logger is not None:
            logger.log(
                "lm_iteration", iter=k, cost=float(info.cost),
                cost_change=float(info.cost_change),
                grad_max=float(info.grad_max),
                step_norm=float(info.step_norm),
                radius=float(info.radius), rho=float(info.rho),
                accepted=bool(info.accepted),
            )
        if checkpoint_path and k % checkpoint_every == 0:
            from deeparc_tpu.utils.checkpoint import save_solver_state

            save_solver_state(
                checkpoint_path, state.params,
                float(state.tr.radius), float(state.tr.decrease_factor),
                k, float(state.cost),
            )
    return BAResult(
        params=state.params, cost=float(state.cost),
        iterations=k, status=int(state.status),
    )
