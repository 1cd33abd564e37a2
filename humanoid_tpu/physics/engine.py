"""The physics engine: state pytree + substep/rollout, batched over envs.

Replaces the reference's inner hot loop (decimation x [PD torque ->
gym.simulate -> refresh], /root/reference/humanoid/envs/custom/
humanoid_env.py:639-649) with a lax.scan of pure substeps; the whole thing
lives inside jit and is vmapped over the env axis, so 4096 robots are one
fused XLA computation and state never leaves the device.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .contact import ContactInfo, ContactParams, Terrain, contact_forces
from .dynamics import compute_dynamics, forward_accel
from .model import RobotModel
from .spatial import quat_integrate, quat_rotate


class PhysState(NamedTuple):
    """Dynamic state of one robot (vmapped to (N, ...) by the env layer)."""
    base_pos: jnp.ndarray   # (3,)
    base_quat: jnp.ndarray  # (4,) wxyz
    qj: jnp.ndarray         # (nj,) joint positions
    u: jnp.ndarray          # (nv,) [omega_world, v_world, qdot]

    @property
    def omega(self):
        return self.u[..., 0:3]

    @property
    def vel(self):
        return self.u[..., 3:6]

    @property
    def qd(self):
        return self.u[..., 6:]


class PhysDiag(NamedTuple):
    """Per-control-step diagnostics (from the final substep) that the env
    layer turns into rewards/observations — the analogue of Isaac's
    refreshed state tensors (rigid_body/contact buffers)."""
    body_pos: jnp.ndarray      # (nb,3)
    body_quat: jnp.ndarray     # (nb,4)
    body_omega: jnp.ndarray    # (nb,3) world angular velocities
    foot_forces: jnp.ndarray   # (n_feet,3) net contact force per foot
    term_force: jnp.ndarray    # (nt,) contact normal force on termination proxies
    tau: jnp.ndarray           # (nj,) applied joint torques (last substep)


class EnvPhysParams(NamedTuple):
    """Per-env domain-randomized physics parameters (batched leaves).
    com/inertia are None unless the corresponding domain randomization is
    enabled, so the default path pays nothing for them
    (legged_robot.py:313-367 randomizes base COM and per-body inertia)."""
    masses: jnp.ndarray     # (nb,) body masses (base row randomized)
    friction: jnp.ndarray   # () ground friction coefficient
    com: Optional[jnp.ndarray] = None      # (nb,3) body-frame COM offsets
    inertia: Optional[jnp.ndarray] = None  # (nb,3,3) body-frame inertias


def _fp32_matmuls(fn):
    """Trace with full-precision matmuls: TPU's default dot precision runs
    fp32 inputs through bf16 MXU passes, which costs ~3 decimal digits on
    the (6,6) dynamics algebra — measured 5% udot error on airborne
    transients vs the Pallas kernel's exact-fp32 VPU math. The physics
    integrator must not inherit that."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


def default_phys_params(model: RobotModel) -> EnvPhysParams:
    return EnvPhysParams(
        masses=jnp.asarray(model.mass), friction=jnp.asarray(1.0)
    )


@_fp32_matmuls
def substep(
    model: RobotModel,
    params: EnvPhysParams,
    terrain: Terrain,
    contact_params: ContactParams,
    state: PhysState,
    tau_j: jnp.ndarray,
    dt: float,
) -> Tuple[PhysState, PhysDiag]:
    """One semi-implicit Euler step at the sim rate (1 kHz)."""
    cache = compute_dynamics(
        model, state.base_pos, state.base_quat, state.qj, state.u,
        mass=params.masses, com=params.com, inertia=params.inertia,
    )
    ci: ContactInfo = contact_forces(
        model, cache.body_pos, cache.body_quat, cache.v_sp, terrain,
        params.friction, contact_params,
    )
    tau_gen = jnp.concatenate([jnp.zeros(6), tau_j]) + ci.tau_gen
    udot = forward_accel(cache, tau_gen, state.u)
    u_new = state.u + dt * udot
    new_state = PhysState(
        base_pos=state.base_pos + dt * u_new[3:6],
        base_quat=quat_integrate(state.base_quat, u_new[0:3], dt),
        qj=state.qj + dt * u_new[6:],
        u=u_new,
    )
    n_feet = len(model.foot_bodies)
    foot_forces = ci.point_forces.reshape(n_feet, -1, 3).sum(axis=1)
    diag = PhysDiag(
        body_pos=cache.body_pos,
        body_quat=cache.body_quat,
        body_omega=cache.v_sp[:, 0:3],
        foot_forces=foot_forces,
        term_force=ci.term_force,
        tau=tau_j,
    )
    return new_state, diag


@_fp32_matmuls
def control_step(
    model: RobotModel,
    params: EnvPhysParams,
    terrain: Terrain,
    contact_params: ContactParams,
    state: PhysState,
    torque_fn: Callable[[PhysState], jnp.ndarray],
    decimation: int,
    dt: float,
) -> Tuple[PhysState, PhysDiag]:
    """One policy-rate step = `decimation` physics substeps with the PD
    torque recomputed every substep (reference humanoid_env.py:639-649)."""

    def body(s, _):
        tau = torque_fn(s)
        s2, diag = substep(
            model, params, terrain, contact_params, s, tau, dt
        )
        return s2, diag

    state, diags = jax.lax.scan(body, state, None, length=decimation)
    last = jax.tree.map(lambda x: x[-1], diags)
    return state, last


# ---------------------------------------------------------------------------
# Batch-level stepping: the production path.
#
# vmap(substep) would push the mass-matrix solve through vmap's batching
# rules; instead we vmap only the tree algebra and hand the (N, nv, nv)
# solve to the Pallas batched-Cholesky kernel (ops/linalg.py), which is the
# hot op on TPU (13.3 ms stock XLA -> sub-ms).
# ---------------------------------------------------------------------------

@_fp32_matmuls
def substep_batch(
    model: RobotModel,
    params: EnvPhysParams,      # batched leaves: masses (N, nb), friction (N,)
    terrain: Terrain,
    contact_params: ContactParams,
    state: PhysState,           # batched (N, ...)
    tau_j: jnp.ndarray,         # (N, nj)
    dt: float,
) -> Tuple[PhysState, PhysDiag]:
    from ..ops.linalg import solve_spd_batch
    from .dynamics import compute_dynamics

    N = tau_j.shape[0]
    cache = jax.vmap(
        lambda bp, bq, qj, u, m, c, I: compute_dynamics(
            model, bp, bq, qj, u, mass=m, com=c, inertia=I
        )
    )(
        state.base_pos, state.base_quat, state.qj, state.u,
        params.masses, params.com, params.inertia,
    )
    ci = jax.vmap(
        lambda bp, bq, v, mu: contact_forces(
            model, bp, bq, v, terrain, mu, contact_params
        )
    )(cache.body_pos, cache.body_quat, cache.v_sp, params.friction)

    tau_gen = (
        jnp.concatenate([jnp.zeros((N, 6), tau_j.dtype), tau_j], axis=1)
        + ci.tau_gen
    )
    rhs = tau_gen - cache.C
    udot = solve_spd_batch(cache.M, rhs)
    # spatial -> conventional acceleration of the base origin point
    omega = state.u[:, 0:3]
    v = state.u[:, 3:6]
    lin = udot[:, 3:6] + jnp.cross(omega, v)
    udot = jnp.concatenate([udot[:, 0:3], lin, udot[:, 6:]], axis=1)

    u_new = state.u + dt * udot
    new_state = PhysState(
        base_pos=state.base_pos + dt * u_new[:, 3:6],
        base_quat=quat_integrate(state.base_quat, u_new[:, 0:3], dt),
        qj=state.qj + dt * u_new[:, 6:],
        u=u_new,
    )
    n_feet = len(model.foot_bodies)
    diag = PhysDiag(
        body_pos=cache.body_pos,
        body_quat=cache.body_quat,
        body_omega=cache.v_sp[:, :, 0:3],
        foot_forces=ci.point_forces.reshape(N, n_feet, -1, 3).sum(axis=2),
        term_force=ci.term_force,
        tau=tau_j,
    )
    return new_state, diag


@_fp32_matmuls
def substep_batch_cached(
    model: RobotModel,
    params: EnvPhysParams,
    terrain: Terrain,
    contact_params: ContactParams,
    state: PhysState,
    tau_j: jnp.ndarray,
    dt: float,
    L: jnp.ndarray,
) -> Tuple[PhysState, PhysDiag]:
    """Substep against a frozen mass-matrix Cholesky factor L (N, nv, nv).

    Kinematics, bias forces and contact are exact for the current state;
    only the inertia coupling lags by up to one control period (joint
    excursion < ~1e-2 rad at 100 Hz), the same order of approximation a
    TGS-style iterative solver makes. Skipping the per-substep CRBA +
    factorization removes ~45% of the physics cost."""
    from ..ops.linalg import apply_spd_batch
    from .dynamics import compute_kinematics_bias

    N = tau_j.shape[0]
    body_pos, body_quat, _, _, v_sp, C = jax.vmap(
        lambda bp, bq, qj, u, m, c, I: compute_kinematics_bias(
            model, bp, bq, qj, u, mass=m, com=c, inertia=I
        )
    )(
        state.base_pos, state.base_quat, state.qj, state.u,
        params.masses, params.com, params.inertia,
    )
    ci = jax.vmap(
        lambda bp, bq, v, mu: contact_forces(
            model, bp, bq, v, terrain, mu, contact_params
        )
    )(body_pos, body_quat, v_sp, params.friction)

    tau_gen = (
        jnp.concatenate([jnp.zeros((N, 6), tau_j.dtype), tau_j], axis=1)
        + ci.tau_gen
    )
    udot = apply_spd_batch(L, tau_gen - C)
    omega = state.u[:, 0:3]
    v = state.u[:, 3:6]
    lin = udot[:, 3:6] + jnp.cross(omega, v)
    udot = jnp.concatenate([udot[:, 0:3], lin, udot[:, 6:]], axis=1)

    u_new = state.u + dt * udot
    new_state = PhysState(
        base_pos=state.base_pos + dt * u_new[:, 3:6],
        base_quat=quat_integrate(state.base_quat, u_new[:, 0:3], dt),
        qj=state.qj + dt * u_new[:, 6:],
        u=u_new,
    )
    n_feet = len(model.foot_bodies)
    diag = PhysDiag(
        body_pos=body_pos,
        body_quat=body_quat,
        body_omega=v_sp[:, :, 0:3],
        foot_forces=ci.point_forces.reshape(N, n_feet, -1, 3).sum(axis=2),
        term_force=ci.term_force,
        tau=tau_j,
    )
    return new_state, diag


def control_step_pallas(
    substep_fn,
    state: PhysState,
    masses: jnp.ndarray,
    friction: jnp.ndarray,
    targets: jnp.ndarray,
    decimation: int,
    nj: int,
) -> Tuple[PhysState, PhysDiag]:
    """Decimated control step through the fused Pallas substep kernel
    (ops/physics_kernel.py): PD + dynamics + contact + solve + integrate in
    one VMEM-resident kernel per substep."""
    from ..ops.physics_kernel import pack_state, unpack_state

    pack = pack_state(state)

    def body(p, _):
        p2, diag = substep_fn(p, masses, friction, targets)
        return p2, diag

    pack, diags = jax.lax.scan(body, pack, None, length=decimation)
    last = jax.tree.map(lambda x: x[-1], diags)
    return unpack_state(pack, nj), PhysDiag(
        body_pos=last.body_pos,
        body_quat=last.body_quat,
        body_omega=last.body_omega,
        foot_forces=last.foot_forces,
        term_force=last.term_force,
        tau=last.tau,
    )


def control_step_pallas_fused(
    control_fn,
    state: PhysState,
    masses: jnp.ndarray,
    friction: jnp.ndarray,
    targets: jnp.ndarray,
    nj: int,
    extras: Tuple[jnp.ndarray, ...] = (),
) -> Tuple[PhysState, PhysDiag]:
    """Decimated control step as ONE fused Pallas kernel
    (ops/physics_kernel.py build_control_fn): the substep loop runs
    on-chip and the diag is the last substep's, matching the reference's
    refresh-after-simulate semantics (humanoid_env.py:649-651). extras are
    the optional per-env (N, rows) inputs the kernel was built with
    (gains / com+inertia / terrain planes)."""
    from ..ops.physics_kernel import pack_state, unpack_state

    pack, diag = control_fn(pack_state(state), masses, friction, targets,
                            *extras)
    return unpack_state(pack, nj), PhysDiag(
        body_pos=diag.body_pos,
        body_quat=diag.body_quat,
        body_omega=diag.body_omega,
        foot_forces=diag.foot_forces,
        term_force=diag.term_force,
        tau=diag.tau,
    )


@_fp32_matmuls
def substep_batch_pgs(
    model: RobotModel,
    params: EnvPhysParams,
    terrain: Terrain,
    contact_params: ContactParams,
    pgs_params,
    state: PhysState,
    tau_j: jnp.ndarray,
    dt: float,
    L: Optional[jnp.ndarray] = None,
) -> Tuple[PhysState, PhysDiag]:
    """Velocity-stepping substep with the constraint-based (block-PGS)
    foot contact solve (physics/pgs.py) — the per-env QP/PGS contact of
    the blueprint (SURVEY.md §7). Termination proxy spheres stay on the
    penalty model: they only matter during falls, where a smooth force is
    all the termination check needs.

    L, when given, is the frozen mass-matrix Cholesky factor (see
    substep_batch_cached); otherwise CRBA + factorization run here."""
    from ..ops.linalg import apply_spd_batch, factor_spd_batch
    from .dynamics import assemble_mass_matrix, compute_kinematics_bias
    from .pgs import foot_contact_set, pgs_solve

    N = tau_j.shape[0]
    body_pos, body_quat, S, I_sp, v_sp, C = jax.vmap(
        lambda bp, bq, qj, u, m, c, I: compute_kinematics_bias(
            model, bp, bq, qj, u, mass=m, com=c, inertia=I
        )
    )(
        state.base_pos, state.base_quat, state.qj, state.u,
        params.masses, params.com, params.inertia,
    )
    if L is None:
        M = jax.vmap(lambda s, i: assemble_mass_matrix(model, s, i))(S, I_sp)
        L = factor_spd_batch(M)

    # termination proxy spheres: penalty force (falls only)
    nt = len(model.term_sphere_body)
    A0 = body_pos[:, 0]
    sph_tau = jnp.zeros((N, model.nv), tau_j.dtype)
    term_fn = jnp.zeros((N, nt), tau_j.dtype)
    if nt:
        from .contact import _point_forces

        for i in range(nt):
            b = int(model.term_sphere_body[i])
            c = body_pos[:, b] + quat_rotate(
                body_quat[:, b], jnp.asarray(model.term_sphere_offset[i])
            )
            low = c - jnp.array([0.0, 0.0, 1.0]) * model.term_sphere_radius[i]
            v = v_sp[:, b, 3:6] + jnp.cross(v_sp[:, b, 0:3], low - A0)
            h = terrain.sample(low[..., 0:2])
            f, fn = _point_forces(low, v, h, params.friction, contact_params)
            term_fn = term_fn.at[:, i].set(fn)
            # generalized force: base wrench + ancestor joint projection
            n_mom = jnp.cross(low - A0, f)
            w_j = quat_rotate(
                body_quat[:, 1:], jnp.asarray(model.joint_axis)
            )                                               # (N,nj,3)
            anchor = body_pos[:, 1:] - A0[:, None]
            lin_j = jnp.cross(anchor, w_j)
            mask = jnp.asarray(model.ancestor_matrix()[b])       # (nj,)
            contrib = (
                jnp.einsum("ni,nji->nj", n_mom, w_j)
                + jnp.einsum("ni,nji->nj", f, lin_j)
            ) * mask
            sph_tau = sph_tau + jnp.concatenate(
                [n_mom, f, contrib], axis=1
            )

    tau_gen = (
        jnp.concatenate([jnp.zeros((N, 6), tau_j.dtype), tau_j], axis=1)
        + sph_tau
    )
    udot_free = apply_spd_batch(L, tau_gen - C)
    u_free = state.u + dt * udot_free                     # spatial

    pts, vels, phi, n, J = foot_contact_set(
        model, body_pos, body_quat, v_sp, terrain
    )
    u_plus, point_forces = pgs_solve(
        u_free, L, phi, n, J, params.friction, dt, pgs_params
    )

    # spatial -> conventional correction on the linear part (same
    # order/convention as substep_batch)
    omega = state.u[:, 0:3]
    v = state.u[:, 3:6]
    u_new = u_plus.at[:, 3:6].add(dt * jnp.cross(omega, v))
    new_state = PhysState(
        base_pos=state.base_pos + dt * u_new[:, 3:6],
        base_quat=quat_integrate(state.base_quat, u_new[:, 0:3], dt),
        qj=state.qj + dt * u_new[:, 6:],
        u=u_new,
    )
    n_feet = len(model.foot_bodies)
    diag = PhysDiag(
        body_pos=body_pos,
        body_quat=body_quat,
        body_omega=v_sp[:, :, 0:3],
        foot_forces=point_forces.reshape(N, n_feet, -1, 3).sum(axis=2),
        term_force=term_fn,
        tau=tau_j,
    )
    return new_state, diag


@_fp32_matmuls
def control_step_pgs(
    model: RobotModel,
    params: EnvPhysParams,
    terrain: Terrain,
    contact_params: ContactParams,
    pgs_params,
    state: PhysState,
    torque_fn: Callable[[PhysState], jnp.ndarray],
    decimation: int,
    dt: float,
    freeze_mass_matrix: bool = True,
) -> Tuple[PhysState, PhysDiag]:
    """Batched decimated control step on the PGS contact path."""
    L = None
    if freeze_mass_matrix:
        from ..ops.linalg import factor_spd_batch
        from .dynamics import assemble_mass_matrix, compute_kinematics_bias

        _, _, S, I_sp, _, _ = jax.vmap(
            lambda bp, bq, qj, u, m, c, I: compute_kinematics_bias(
                model, bp, bq, qj, u, mass=m, com=c, inertia=I
            )
        )(
            state.base_pos, state.base_quat, state.qj, state.u,
            params.masses, params.com, params.inertia,
        )
        M = jax.vmap(lambda s, i: assemble_mass_matrix(model, s, i))(S, I_sp)
        L = factor_spd_batch(M)

    def body(s, _):
        tau = torque_fn(s)
        s2, diag = substep_batch_pgs(
            model, params, terrain, contact_params, pgs_params, s, tau,
            dt, L=L,
        )
        return s2, diag

    state, diags = jax.lax.scan(body, state, None, length=decimation)
    last = jax.tree.map(lambda x: x[-1], diags)
    return state, last


@_fp32_matmuls
def control_step_batch(
    model: RobotModel,
    params: EnvPhysParams,
    terrain: Terrain,
    contact_params: ContactParams,
    state: PhysState,
    torque_fn: Callable[[PhysState], jnp.ndarray],
    decimation: int,
    dt: float,
    freeze_mass_matrix: bool = False,
) -> Tuple[PhysState, PhysDiag]:
    """Batched decimated control step (PD recomputed each substep).

    With freeze_mass_matrix, the CRBA mass matrix is assembled and
    factorized ONCE per control step from the entry configuration and its
    Cholesky factor is reused by all `decimation` substeps."""
    if freeze_mass_matrix:
        from ..ops.linalg import factor_spd_batch
        from .dynamics import assemble_mass_matrix, compute_kinematics_bias

        _, _, S, I_sp, _, _ = jax.vmap(
            lambda bp, bq, qj, u, m, c, I: compute_kinematics_bias(
                model, bp, bq, qj, u, mass=m, com=c, inertia=I
            )
        )(
            state.base_pos, state.base_quat, state.qj, state.u,
            params.masses, params.com, params.inertia,
        )
        M = jax.vmap(lambda s, i: assemble_mass_matrix(model, s, i))(S, I_sp)
        L = factor_spd_batch(M)

        def body_frozen(s, _):
            tau = torque_fn(s)
            s2, diag = substep_batch_cached(
                model, params, terrain, contact_params, s, tau, dt, L
            )
            return s2, diag

        state, diags = jax.lax.scan(
            body_frozen, state, None, length=decimation
        )
        last = jax.tree.map(lambda x: x[-1], diags)
        return state, last

    def body(s, _):
        tau = torque_fn(s)
        s2, diag = substep_batch(
            model, params, terrain, contact_params, s, tau, dt
        )
        return s2, diag

    state, diags = jax.lax.scan(body, state, None, length=decimation)
    last = jax.tree.map(lambda x: x[-1], diags)
    return state, last
