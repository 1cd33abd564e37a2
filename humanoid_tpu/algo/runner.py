"""On-policy training runner: rollout + GAE + PPO update as ONE jitted
function per iteration.

Rebuild of OnPolicyRunner.learn (/root/reference/humanoid/algo/ppo/
on_policy_runner.py:93-182): the reference's Python rollout loop (60
env.step calls under inference_mode) becomes a lax.scan, so an entire
training iteration — 60-step rollout, timeout bootstrapping, GAE, 2x4
minibatch PPO — is a single XLA computation and env state never leaves the
device (SURVEY.md §7 "key idiomatic moves").
"""
from __future__ import annotations

import time
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.structs import XBotLCfgPPO
from ..env.xbotl import EnvState, XBotLEnv
from .gae import compute_gae
from .networks import ActorCritic, init_params, log_prob, sample_action
from .ppo import Batch, TrainState, UpdateMetrics, init_train_state, ppo_update


class IterationCarry(NamedTuple):
    train_state: TrainState
    env_state: EnvState
    obs: jnp.ndarray
    critic_obs: jnp.ndarray
    key: jnp.ndarray


class IterationMetrics(NamedTuple):
    update: UpdateMetrics
    mean_step_reward: jnp.ndarray
    ep_rew_sums: jnp.ndarray      # (n_rew,) summed over finished episodes
    ep_count: jnp.ndarray
    ep_len_sum: jnp.ndarray
    ep_term_count: jnp.ndarray    # episodes ended by failure (not timeout)
    mean_action_std: jnp.ndarray
    rew_terms_mean: jnp.ndarray   # (n_rew,) mean per-step contribution
    # terrain game-curriculum progression (legged_robot.py:541-560):
    # mean difficulty row across envs at iteration end (0 on plane)
    terrain_level_mean: jnp.ndarray
    # difficulty-occupancy histogram (VERDICT r4 next #2): fraction of
    # envs on each difficulty row at iteration end ((10,); zeros on plane)
    terrain_level_hist: jnp.ndarray


class OnPolicyRunner:
    """env + nets + jitted train iteration + checkpoint/log glue."""

    def __init__(self, env: XBotLEnv, train_cfg: XBotLCfgPPO,
                 log_dir: Optional[str] = None):
        self.env = env
        self.cfg = train_cfg
        self.log_dir = log_dir
        ecfg = env.cfg.env
        self.net = ActorCritic(
            num_actions=ecfg.num_actions,
            actor_hidden_dims=train_cfg.policy.actor_hidden_dims,
            critic_hidden_dims=train_cfg.policy.critic_hidden_dims,
            vel_est_hidden_dims=train_cfg.policy.vel_est_hidden_dims,
            init_noise_std=train_cfg.policy.init_noise_std,
            compute_dtype=train_cfg.policy.compute_dtype,
        )
        key = jax.random.PRNGKey(train_cfg.seed)
        kinit, self.key = jax.random.split(key)
        params = init_params(
            kinit, self.net, ecfg.num_observations, ecfg.num_privileged_obs
        )
        self.train_state = init_train_state(params, train_cfg.algorithm)
        # velocity-estimator target: base_lin_vel slice of the OLDEST critic
        # frame (rollout_storage.py:164 '53:56' = 5 + 4*nj for 12 dof)
        lo = 5 + 4 * ecfg.num_actions
        self.vel_slice = (lo, lo + 3)
        # mirror-symmetry permutation matrices (ppo.py:92-105); only built
        # when the loss is enabled so the default path ships no extra consts
        if train_cfg.algorithm.sym_loss:
            from .symmetry import xbot_perm_matrices

            obs_perm, act_perm = xbot_perm_matrices(
                frame_stack=ecfg.frame_stack, nj=ecfg.num_actions
            )
            self.obs_perm = jnp.asarray(obs_perm)
            self.act_perm = jnp.asarray(act_perm)
        else:
            self.obs_perm = self.act_perm = None
        self.iteration = 0
        # optional checkpoint hook: callable(runner, ckpt_path, iteration),
        # e.g. deploy.eval_gate.CheckpointEvalGate (async sim2sim per save)
        self.on_checkpoint = None
        self._train_iter = jax.jit(self._train_iteration)
        # superstep: K iterations per dispatch (lax.scan). Device time per
        # iteration is ~64 ms but each host->device dispatch costs tens of
        # ms (buffer marshalling / remote-tunnel latency), so batching K
        # iterations into ONE jitted call amortizes it K-fold.
        self._superstep_cache = {}

    def _train_superstep(self, k: int):
        fn = self._superstep_cache.get(k)
        if fn is None:
            def scan_k(carry):
                return jax.lax.scan(
                    lambda c, _: self._train_iteration(c), carry, None,
                    length=k,
                )

            fn = jax.jit(scan_k)
            self._superstep_cache[k] = fn
        return fn

    # ------------------------------------------------------------------

    def init_carry(self, init_at_random_ep_len: bool = True) -> IterationCarry:
        """env reset + first zero-action step (base_task.py:144-149,
        on_policy_runner.py:91,104-107)."""
        k_env, k_step, self.key = jax.random.split(self.key, 3)
        state = self.env.initial_state(k_env)
        if init_at_random_ep_len:
            k_len, self.key = jax.random.split(self.key)
            state = state._replace(
                episode_length=jax.random.randint(
                    k_len, state.episode_length.shape, 0,
                    self.env.max_episode_length,
                )
            )
        nj = self.env.cfg.env.num_actions
        N = self.env.cfg.env.num_envs
        state, out = jax.jit(self.env.step)(
            state, jnp.zeros((N, nj)), k_step
        )
        k_iter, self.key = jax.random.split(self.key)
        return IterationCarry(
            train_state=self.train_state,
            env_state=state,
            obs=out.obs,
            critic_obs=out.privileged_obs,
            key=k_iter,
        )

    # ------------------------------------------------------------------

    def _train_iteration(
        self, carry: IterationCarry
    ) -> Tuple[IterationCarry, IterationMetrics]:
        acfg = self.cfg.algorithm
        T = self.cfg.runner.num_steps_per_env
        net = self.net

        course_ratio = self.env.cfg.rewards.course_ratio
        if course_ratio != 1.0:
            # reward curriculum gain, x ratio per iteration capped at 20
            # (on_policy_runner.py:160-162); applied on-device so the
            # iteration scans cleanly into supersteps
            es = carry.env_state
            carry = carry._replace(
                env_state=es._replace(
                    course_gain=jnp.minimum(
                        20.0, es.course_gain * course_ratio
                    )
                )
            )

        # the action std is a state-independent learned parameter — hoist it
        # out of the rollout scan (reference samples from one Normal(mu, std)
        # whose std is the same nn.Parameter every step)
        std = jnp.maximum(
            carry.train_state.params["params"]["std"], 1e-3
        )
        store_dt = jnp.dtype(self.cfg.policy.compute_dtype)

        def rollout_step(c, _):
            ts, env_state, obs, critic_obs, key = c
            k_act, k_env, key = jax.random.split(key, 3)
            # actor-only forward: the critic values for GAE and timeout
            # bootstrapping do not influence the rollout, so they are
            # computed AFTER the scan in one (T*N)-row batched pass — same
            # numbers (identical per-row bf16 matmuls), one large
            # MXU-efficient matmul instead of 60 small dispatches, and the
            # unused vel-head forward disappears from the hot loop
            mean = net.apply(ts.params, obs, method="act_mean")
            action = sample_action(k_act, mean, std)
            logp = log_prob(mean, std, action)
            env_state, out = self.env.step(env_state, action, k_env)
            # store obs in the compute dtype: under bf16 they only feed
            # bf16 matmuls in the update, and the (T*N, K) trajectory is
            # the iteration's largest HBM tenant — halving it halves
            # shuffle+update read traffic
            transition = Batch(
                obs=obs.astype(store_dt),
                critic_obs=critic_obs.astype(store_dt),
                actions=action,
                old_logp=logp,
                old_mu=mean,
                old_sigma=jnp.broadcast_to(std, mean.shape),
                target_values=out.rew,       # raw rewards, see post-scan
                advantages=out.rew,          # placeholder, filled post-GAE
                returns=out.reset.astype(jnp.float32),  # dones, ditto
            )
            stats = (
                out.rew, out.ep_rew_sums, out.ep_count, out.ep_len_sum,
                out.ep_term_count, out.rew_terms_mean,
            )
            return (
                (ts, env_state, out.obs, out.privileged_obs, key),
                (transition, stats, out.time_outs),
            )

        # unroll: when the fused Pallas kernel carries the physics the
        # rollout body is light (one kernel call + a small policy matmul +
        # elementwise obs/reward), so per-trip scan overhead is a
        # measurable slice (~4 ms/iter of `while` self-time) and unrolling
        # amortizes it. On the XLA physics path the body is hundreds of
        # fusions — unrolling there multiplies an already-long XLA compile
        # ~6x (measured: the PGS-contact superstep went from >45 min to
        # minutes with unroll=1) for no runtime win, so don't.
        if getattr(self.env, "_control_fn", None) is not None:
            unroll = max(u for u in (1, 2, 3, 4, 5, 6) if T % u == 0)
        else:
            unroll = 1
        (ts, env_state, obs, critic_obs, key), (traj, stats, time_outs) = (
            jax.lax.scan(
                rollout_step,
                (carry.train_state, carry.env_state, carry.obs,
                 carry.critic_obs, carry.key),
                None,
                length=T,
                unroll=unroll,
            )
        )
        dones = traj.returns               # (T, N)
        N = dones.shape[1]
        # batched value pass over the whole trajectory + the bootstrap obs:
        # one ((T+1)*N, K') critic matmul replaces T+1 per-step forwards.
        # Inputs are the stored compute-dtype stacks — identical rounding to
        # casting the fresh f32 obs inside the per-step Dense, so the values
        # (and everything downstream) are unchanged.
        values = net.apply(
            ts.params, traj.critic_obs.reshape((T * N, -1)), method="value"
        ).reshape((T, N))
        last_values = net.apply(
            ts.params, critic_obs.astype(store_dt), method="value"
        )
        # timeout bootstrapping (ppo.py:132-138), gated on the env
        # advertising time_outs (send_timeouts, legged_robot.py:889 —
        # the reference only bootstraps when 'time_outs' is in infos)
        if self.env.cfg.env.send_timeouts:
            rewards = traj.target_values + acfg.gamma * values * time_outs
        else:
            rewards = traj.target_values   # raw per-step rewards
        traj = traj._replace(target_values=values)
        advantages, returns = compute_gae(
            rewards, values, dones, last_values,
            acfg.gamma, acfg.lam,
        )
        # global advantage normalization (rollout_storage.py:143)
        adv_mean = jnp.mean(advantages)
        adv_std = jnp.std(advantages)
        norm_adv = (advantages - adv_mean) / (adv_std + 1e-8)

        def flat(x):
            return x.reshape((-1,) + x.shape[2:])

        batch = Batch(
            obs=flat(traj.obs),
            critic_obs=flat(traj.critic_obs),
            actions=flat(traj.actions),
            old_logp=flat(traj.old_logp),
            old_mu=flat(traj.old_mu),
            old_sigma=flat(traj.old_sigma),
            target_values=flat(traj.target_values),
            advantages=flat(norm_adv),
            returns=flat(returns),
        )
        k_update, key = jax.random.split(key)
        ts, update_metrics = ppo_update(
            net, acfg, ts, batch, k_update, self.vel_slice,
            obs_perm=self.obs_perm, act_perm=self.act_perm,
        )
        (step_rew, ep_rew_sums, ep_count, ep_len_sum, ep_term_count,
         rew_terms) = stats
        metrics = IterationMetrics(
            update=update_metrics,
            mean_step_reward=jnp.mean(step_rew),
            ep_rew_sums=jnp.sum(ep_rew_sums, axis=0),
            ep_count=jnp.sum(ep_count),
            ep_len_sum=jnp.sum(ep_len_sum),
            ep_term_count=jnp.sum(ep_term_count),
            mean_action_std=jnp.mean(
                jnp.maximum(ts.params["params"]["std"], 1e-3)
            ),
            rew_terms_mean=jnp.mean(rew_terms, axis=0),
            terrain_level_mean=jnp.mean(
                env_state.terrain_levels.astype(jnp.float32)
            ),
            terrain_level_hist=jnp.mean(
                (env_state.terrain_levels[:, None]
                 == jnp.arange(10, dtype=jnp.int32)[None, :])
                .astype(jnp.float32),
                axis=0,
            ),
        )
        new_carry = IterationCarry(
            train_state=ts, env_state=env_state, obs=obs,
            critic_obs=critic_obs, key=key,
        )
        return new_carry, metrics

    # ------------------------------------------------------------------

    def learn(
        self,
        num_iterations: int,
        init_at_random_ep_len: bool = True,
        log_fn=None,
        carry: Optional[IterationCarry] = None,
    ) -> IterationCarry:
        if carry is None:
            carry = self.init_carry(init_at_random_ep_len)
        N = self.env.cfg.env.num_envs
        T = self.cfg.runner.num_steps_per_env
        save_every = self.cfg.runner.save_interval
        K = max(1, min(self.cfg.runner.iters_per_dispatch, num_iterations))
        pending = None
        saved_at = None

        def flush(pending):
            # double-buffered metrics: the device computes the next chunk
            # while the host logs the previous one (one batched device_get
            # per dispatch; per-scalar float() pulls were ~35 round trips)
            last_it, p_metrics, p_t0, p_k = pending
            host = jax.device_get(p_metrics)  # syncs that chunk
            dt = time.time() - p_t0
            for j in range(p_k):
                m_j = jax.tree.map(lambda x: x[j], host)
                log_fn(last_it - p_k + 1 + j, m_j, T * N * p_k / dt,
                       dt / p_k)

        done = 0
        while done < num_iterations:
            k = min(K, num_iterations - done)
            if save_every:
                # never cross a checkpoint boundary inside one dispatch
                k = min(k, save_every - (self.iteration % save_every))
            t0 = time.time()
            carry, metrics = self._train_superstep(k)(carry)
            self.iteration += k
            done += k
            self.train_state = carry.train_state
            if log_fn is not None and pending is not None:
                flush(pending)
            pending = (self.iteration, metrics, t0, k)
            if self.log_dir and save_every and self.iteration % save_every == 0:
                jax.block_until_ready(carry.train_state.params)
                self.save()
                self._maybe_save_state(carry)
                saved_at = self.iteration
        if pending is not None and log_fn is not None:
            flush(pending)
        jax.block_until_ready(carry.train_state.params)
        if self.log_dir and saved_at != self.iteration:
            self.save()
            self._maybe_save_state(carry)
        return carry

    # ------------------------------------------------------------------

    def _ckpt_payload(self):
        return {
            "params": self.train_state.params,
            "opt_state": self.train_state.opt_state,
            "lr": self.train_state.lr,
            "iteration": jnp.asarray(self.iteration),
        }

    def save(self, path: Optional[str] = None) -> str:
        """Checkpoint model+optimizer+iteration (on_policy_runner.py:293-302).

        Multi-host: only process 0 writes. The payload is fully replicated
        (params/opt-state live unsharded on every host), so it is pulled to
        host memory first — orbax then sees plain numpy and no cross-process
        coordination is needed (VERDICT r1 weak #3)."""
        import os

        from ..parallel.dist import is_main
        from ..utils.checkpoint import save_checkpoint

        path = path or os.path.join(self.log_dir, f"model_{self.iteration}")
        if is_main():
            save_checkpoint(path, jax.device_get(self._ckpt_payload()))
            if self.on_checkpoint is not None:
                self.on_checkpoint(self, path, self.iteration)
        return path

    def _maybe_save_state(self, carry: IterationCarry) -> None:
        # getattr: RunnerCfg instances may predate this field (e.g. configs
        # restored from older runs)
        if getattr(self.cfg.runner, "save_env_state", False):
            self.save_state(carry)

    def save_state(self, carry: IterationCarry, path: Optional[str] = None) -> str:
        """Exact-state checkpoint: the FULL iteration carry (env state incl.
        curricula/obs-history/PRNG key, plus train state), so resume
        continues the run bitwise instead of re-initializing envs. Superset
        of the reference, which persists model+optimizer only
        (on_policy_runner.py:293-302) and restarts every episode on resume.

        Leaves are stored as a flat index->array dict (the carry's treedef
        is reconstructed from a template on load), which keeps orbax to
        plain-dict payloads. Multi-process runs skip it: the env axis is
        sharded, so no single host holds the full carry."""
        import os

        from ..parallel.dist import is_main
        from ..utils.checkpoint import save_checkpoint

        path = path or os.path.join(self.log_dir, f"state_{self.iteration}")
        if jax.process_count() > 1:
            import logging

            logging.getLogger(__name__).warning(
                "save_env_state skipped: exact-state checkpoints are "
                "single-process only (env axis is sharded across hosts)"
            )
            return path
        leaves = jax.tree.flatten(carry)[0]
        payload = {str(i): leaf for i, leaf in enumerate(leaves)}
        payload["iteration"] = jnp.asarray(self.iteration)
        if is_main():
            save_checkpoint(path, jax.device_get(payload))
        return path

    def load_state(self, path: str, template: IterationCarry) -> IterationCarry:
        """Restore an exact-state checkpoint into the structure of
        `template` (any carry from init_carry()). Also syncs the runner's
        train_state and iteration counter."""
        from ..utils.checkpoint import load_checkpoint

        leaves, treedef = jax.tree.flatten(template)
        tmpl = {str(i): leaf for i, leaf in enumerate(leaves)}
        tmpl["iteration"] = jnp.asarray(0)
        restored = load_checkpoint(path, tmpl)
        self.iteration = int(restored.pop("iteration"))
        carry = jax.tree.unflatten(
            treedef, [restored[str(i)] for i in range(len(leaves))]
        )
        self.train_state = carry.train_state
        return carry

    def load(self, path: str, load_optimizer: bool = True) -> None:
        from ..utils.checkpoint import load_checkpoint

        restored = load_checkpoint(path, self._ckpt_payload())
        ts = self.train_state
        self.train_state = ts._replace(
            params=restored["params"],
            opt_state=restored["opt_state"] if load_optimizer else ts.opt_state,
            lr=restored["lr"] if load_optimizer else ts.lr,
        )
        self.iteration = int(restored["iteration"])

    # ------------------------------------------------------------------

    def inference_policy(self):
        """Deterministic actor (reference get_inference_policy,
        on_policy_runner.py:312-316)."""
        params = self.train_state.params
        net = self.net

        @jax.jit
        def policy(obs):
            return net.apply(params, obs, method="act_mean")

        return policy
