"""Dev experiment: bisect which robust-task ingredient collapses walking.

The full humanoid_ppo_robust run converges to standing (tracking_lin_vel
~0.45 vs flagship 0.87; play/gate replays travel ~0.05 m under a 0.5 m/s
command). Candidate culprits: (a) the stand/walk gait schedule + sw_switch,
(b) the extended DR intensity (motor strength/offset, kp/kd, lag), (c) the
command curriculum. Each variant trains ITERS iterations on the real chip
and reports tracking reward + an in-sim distance probe.
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

ITERS = 1200


def variant_cfgs():
    from humanoid_tpu.config.structs import (
        CommandsCfg,
        DomainRandCfg,
        RewardsCfg,
        XBotLCfg,
    )

    dr_full = DomainRandCfg(
        randomize_link_mass=True,
        randomize_base_com=True,
        randomize_inertia=True,
        randomize_motor_strength=True,
        randomize_motor_offset=True,
        randomize_kp_factor=True,
        randomize_kd_factor=True,
        randomize_lag_timesteps=True,
    )
    dr_mild = dataclasses.replace(
        dr_full,
        motor_strength_range=(0.9, 1.1),
        motor_offset_range=(-0.02, 0.02),
        kp_factor_range=(0.9, 1.1),
        kd_factor_range=(0.9, 1.1),
        lag_timesteps=3,
    )
    sched = CommandsCfg(
        curriculum=True, sw_switch=True,
        gait=("walk_omnidirectional", "stand", "walk_omnidirectional"),
    )
    plain_cmds = CommandsCfg()
    rew = RewardsCfg(course_ratio=1.001)
    return {
        # (a) full DR, NO stand schedule / sw_switch / curriculum
        "dr_only": XBotLCfg(domain_rand=dr_full, commands=plain_cmds,
                            rewards=rew),
        # (b) mild DR, WITH the schedule
        "mild_dr_sched": XBotLCfg(domain_rand=dr_mild, commands=sched,
                                  rewards=rew),
        # (c) full DR + schedule, NO command curriculum
        "no_cmd_curr": XBotLCfg(
            domain_rand=dr_full,
            commands=dataclasses.replace(sched, curriculum=False),
            rewards=rew,
        ),
    }


def probe_distance(runner, env, carry, seconds=4.0):
    """In-sim walk probe: pin command (0.5,0,0), roll the CURRENT policy,
    return forward distance of env 0."""
    import jax
    import jax.numpy as jnp

    steps = int(seconds / env.dt)
    params = carry.train_state.params
    net = runner.net

    @jax.jit
    def probe_step(c, key):
        state, obs = c
        cmd = state.commands.at[:, 0].set(0.5)
        cmd = cmd.at[:, 1:].set(0.0)
        state = state._replace(commands=cmd)
        act = net.apply(params, obs, method="act_mean")
        state, out = env.step(state, act, key)
        return (state, out.obs), None

    state, obs = carry.env_state, carry.obs
    x0 = float(state.phys.base_pos[0, 0])
    (state, obs), _ = jax.lax.scan(
        probe_step, (state, obs), jax.random.split(jax.random.PRNGKey(123),
                                                   steps)
    )
    return float(state.phys.base_pos[0, 0]) - x0


def main():
    from humanoid_tpu.algo.runner import OnPolicyRunner
    from humanoid_tpu.config.structs import XBotLCfgPPO
    from humanoid_tpu.env import XBotLEnv

    only = sys.argv[1] if len(sys.argv) > 1 else None
    results = {}
    for name, cfg in variant_cfgs().items():
        if only and name != only:
            continue
        print(f"=== {name} ===", flush=True)
        env = XBotLEnv(cfg)
        runner = OnPolicyRunner(env, XBotLCfgPPO())
        t0 = time.time()
        track = {}

        def log_fn(it, m, fps, dt):
            if it % 200 == 0:
                ti = env.reward_names.index("tracking_lin_vel")
                ep = float(m.ep_rew_sums[ti]) / max(1.0, float(m.ep_count))
                track[it] = round(ep / max(1e-9, float(m.ep_len_sum) /
                                           max(1.0, float(m.ep_count))), 4)
                print(f"[{name}] it {it} rew "
                      f"{float(m.ep_rew_sums.sum())/max(1,float(m.ep_count)):.2f} "
                      f"track/step {track[it]:.4f} fps {fps:,.0f}", flush=True)

        carry = runner.learn(ITERS, init_at_random_ep_len=True, log_fn=log_fn)
        dist = probe_distance(runner, env, carry)
        results[name] = {"wall_s": round(time.time() - t0, 1),
                         "track": track, "probe_distance_m": round(dist, 3)}
        print(f"[{name}] probe distance over 4 s @0.5 m/s: {dist:.3f} m",
              flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
