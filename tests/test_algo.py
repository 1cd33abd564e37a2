"""Algorithm-layer unit tests: distributions, GAE, PPO update semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from humanoid_tpu.algo.gae import compute_gae
from humanoid_tpu.algo.networks import (
    ActorCritic,
    entropy,
    init_params,
    kl_divergence,
    log_prob,
    sample_action,
)
from humanoid_tpu.algo.ppo import Batch, init_train_state, ppo_update
from humanoid_tpu.config.structs import AlgorithmCfg


def test_log_prob_matches_gaussian():
    rng = np.random.RandomState(0)
    mean = rng.randn(4, 3)
    std = np.abs(rng.randn(4, 3)) + 0.5
    a = rng.randn(4, 3)
    lp = np.array(log_prob(jnp.array(mean), jnp.array(std), jnp.array(a)))
    expect = (
        -0.5 * ((a - mean) / std) ** 2 - np.log(std) - 0.5 * np.log(2 * np.pi)
    ).sum(-1)
    np.testing.assert_allclose(lp, expect, rtol=1e-5)


def test_entropy_and_kl():
    std = jnp.array([[1.0, 2.0]])
    e = float(entropy(std)[0])
    expect = sum(0.5 + 0.5 * np.log(2 * np.pi) + np.log(s) for s in [1.0, 2.0])
    assert abs(e - expect) < 1e-5
    # KL of identical distributions ~ 0 (the reference formula has a +1e-5
    # inside the log, so exactly zero is not expected)
    kl = float(kl_divergence(jnp.zeros(3), jnp.ones(3), jnp.zeros(3), jnp.ones(3)))
    assert abs(kl) < 1e-4


def test_gae_matches_numpy_loop():
    """Reverse-scan GAE == the reference's python loop
    (rollout_storage.py:122-143)."""
    rng = np.random.RandomState(1)
    T, N = 7, 3
    r = rng.randn(T, N).astype(np.float32)
    v = rng.randn(T, N).astype(np.float32)
    d = (rng.rand(T, N) > 0.7).astype(np.float32)
    last_v = rng.randn(N).astype(np.float32)
    gamma, lam = 0.994, 0.9
    adv_ref = np.zeros((T, N), np.float32)
    a = np.zeros(N, np.float32)
    for t in reversed(range(T)):
        nv = last_v if t == T - 1 else v[t + 1]
        nd = 1.0 - d[t]
        delta = r[t] + gamma * nv * nd - v[t]
        a = delta + gamma * lam * nd * a
        adv_ref[t] = a
    adv, ret = compute_gae(
        jnp.array(r), jnp.array(v), jnp.array(d), jnp.array(last_v), gamma, lam
    )
    np.testing.assert_allclose(np.array(adv), adv_ref, atol=1e-5)
    np.testing.assert_allclose(np.array(ret), adv_ref + v, atol=1e-5)


def _make_net_and_batch(key, B=64, num_obs=20, num_priv=30, nj=4):
    net = ActorCritic(
        num_actions=nj,
        actor_hidden_dims=(32, 32),
        critic_hidden_dims=(32, 32),
        vel_est_hidden_dims=(16,),
    )
    k1, k2 = jax.random.split(key)
    params = init_params(k1, net, num_obs, num_priv)
    ks = jax.random.split(k2, 6)
    obs = jax.random.normal(ks[0], (B, num_obs))
    priv = jax.random.normal(ks[1], (B, num_priv))
    mean, std, value, _ = net.apply(params, obs, priv)
    actions = sample_action(ks[2], mean, std)
    batch = Batch(
        obs=obs,
        critic_obs=priv,
        actions=actions,
        old_logp=log_prob(mean, std, actions),
        old_mu=mean,
        old_sigma=jnp.broadcast_to(std, mean.shape),
        target_values=value,
        advantages=jax.random.normal(ks[3], (B,)),
        returns=value + jax.random.normal(ks[4], (B,)) * 0.1,
    )
    return net, params, batch


def test_ppo_update_changes_params_and_adapts_lr():
    cfg = AlgorithmCfg(num_learning_epochs=2, num_mini_batches=4)
    net, params, batch = _make_net_and_batch(jax.random.PRNGKey(0))
    ts = init_train_state(params, cfg)
    ts2, m = ppo_update(
        net, cfg, ts, batch, jax.random.PRNGKey(1), (5, 8)
    )
    # params moved
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), ts.params, ts2.params
    )
    assert max(jax.tree.leaves(diff)) > 0
    # data fresh from the same policy: kl ~ 0 -> adaptive lr grows (x1.5/mb,
    # capped) — reference ppo.py:170-171
    assert float(ts2.lr) > float(ts.lr)
    assert float(ts2.lr) <= cfg.max_lr + 1e-9
    for v in (m.value_loss, m.surrogate_loss, m.vel_loss, m.kl):
        assert np.isfinite(float(v))


def test_ppo_update_fixed_schedule_keeps_lr():
    cfg = AlgorithmCfg(schedule="fixed")
    net, params, batch = _make_net_and_batch(jax.random.PRNGKey(2))
    ts = init_train_state(params, cfg)
    ts2, _ = ppo_update(net, cfg, ts, batch, jax.random.PRNGKey(3), (5, 8))
    assert float(ts2.lr) == float(ts.lr)


def test_value_loss_decreases_when_training_critic():
    """Several updates on a fixed regression target shrink the value loss."""
    cfg = AlgorithmCfg(
        schedule="fixed", learning_rate=1e-3, num_learning_epochs=4,
        num_mini_batches=2, entropy_coef=0.0,
    )
    net, params, batch = _make_net_and_batch(jax.random.PRNGKey(4), B=128)
    batch = batch._replace(advantages=jnp.zeros_like(batch.advantages))
    ts = init_train_state(params, cfg)
    _, m0 = ppo_update(net, cfg, ts, batch, jax.random.PRNGKey(5), (5, 8))
    for i in range(5):
        ts, m = ppo_update(net, cfg, ts, batch, jax.random.PRNGKey(6 + i), (5, 8))
    assert float(m.value_loss) < float(m0.value_loss)

