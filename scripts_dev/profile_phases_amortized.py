"""Dev tool: dispatch-amortized phase attribution of the training
iteration (VERDICT r4 next #3 follow-up).

The committed per-phase numbers (validation/pgs_profile/profile.txt) time
separately-jitted calls, each carrying ~15-20 ms of host dispatch through
the remote-compile tunnel — fine for RELATIVE reads, wrong for absolute
attribution (the HLO trace shows the device mostly idle during a single
dispatched update). This script times K-iteration lax.scan supersteps
(zero host involvement inside), so per-iteration numbers are true
device(+infeed) costs:

  A. full iteration (the bench protocol)
  B. rollout-only iteration (no ppo_update)  -> update = A - B
  C. A with shuffle_granule 32
  D. A with pgs_iterations 6 (cold, freeze_prep kept)
  E. A with fused actor+vel first layer (if implemented)

Usage (chip idle):  python scripts_dev/profile_phases_amortized.py
"""
from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from humanoid_tpu.algo.runner import OnPolicyRunner
from humanoid_tpu.utils import registry

K = 10
N, T = 4096, 60


def bench(name, runner, carry, variant_iteration=None, reps=3):
    if variant_iteration is None:
        fn = runner._train_superstep(K)
    else:
        fn = jax.jit(lambda c: jax.lax.scan(
            lambda cc, _: variant_iteration(cc), c, None, length=K))
    carry2, _ = fn(carry)
    jax.block_until_ready(carry2.train_state.params)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        carry2, _ = fn(carry2)
        jax.block_until_ready(carry2.train_state.params)
        ts.append(time.time() - t0)
    ms = min(ts) / K * 1e3
    print(f"{name:52s} {ms:8.2f} ms/iter "
          f"({N * T / (min(ts) / K) / 1e6:6.2f} M env-steps/s)", flush=True)
    return ms


def make(task="humanoid_ppo", granule=None, pgs_iters=None):
    cfg, tcfg = registry.get_cfgs(task)
    if granule is not None:
        tcfg = tcfg.replace(algorithm=dataclasses.replace(
            tcfg.algorithm, shuffle_granule=granule))
    if pgs_iters is not None:
        cfg = cfg.replace(sim=dataclasses.replace(
            cfg.sim, pgs_iterations=pgs_iters))
    env, _ = registry.make_env(task, env_cfg=cfg)
    runner = OnPolicyRunner(env, tcfg)
    return runner, runner.init_carry()


def main():
    runner, carry = make()
    a = bench("A. full iteration (shipping)", runner, carry)

    # B: rollout-only — reuse the runner's iteration with the update
    # replaced by identity (same rollout/GAE/normalization work)
    import humanoid_tpu.algo.runner as R

    orig = R.ppo_update

    def no_update(net, acfg, ts, batch, key, vel_slice, **kw):
        from humanoid_tpu.algo.ppo import UpdateMetrics

        z = jnp.zeros(())
        return ts, UpdateMetrics(z, z, z, z, z, ts.lr)

    R.ppo_update = no_update
    try:
        runner_b, carry_b = make()
        b = bench("B. rollout+GAE only (update stubbed)", runner_b, carry_b)
    finally:
        R.ppo_update = orig
    print(f"   -> update on-device cost = {a - b:.2f} ms/iter")

    runner_c, carry_c = make(granule=32)
    bench("C. full iteration, granule 32", runner_c, carry_c)

    runner_d, carry_d = make(pgs_iters=6)
    bench("D. full iteration, PGS 6 cold sweeps", runner_d, carry_d)


if __name__ == "__main__":
    main()
