"""C++ deployment policy runtime vs the numpy reference (NpzPolicy):
same exported .npz, same outputs. The native runtime must parse the real
np.savez container (stored-method ZIP of .npy members) and reproduce the
ELU MLP to float32 roundoff."""
import numpy as np
import pytest

from humanoid_tpu.deploy.npz_policy import NpzPolicy
from humanoid_tpu.native.policy_native import (
    NativePolicy,
    native_policy_available,
)

needs_native = pytest.mark.skipif(
    not native_policy_available(), reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def npz_path(tmp_path_factory):
    """Random actor+vel export with the real exporter layer naming."""
    rng = np.random.RandomState(0)
    arrays = {}
    dims = [47 * 15, 512, 256, 128, 12]
    for i in range(4):
        arrays[f"actor_w{i}"] = rng.randn(dims[i], dims[i + 1]).astype(
            np.float32
        ) * 0.1
        arrays[f"actor_b{i}"] = rng.randn(dims[i + 1]).astype(np.float32)
    vdims = [47 * 15, 128, 128, 3]
    for i in range(3):
        arrays[f"vel_w{i}"] = rng.randn(vdims[i], vdims[i + 1]).astype(
            np.float32
        ) * 0.1
        arrays[f"vel_b{i}"] = rng.randn(vdims[i + 1]).astype(np.float32)
    arrays["std"] = np.ones(12, dtype=np.float32)
    arrays["meta_tag"] = np.asarray(3.0)  # float64 scalar, must be skipped
    path = str(tmp_path_factory.mktemp("export") / "policy.npz")
    np.savez(path, **arrays)
    return path


@needs_native
@pytest.mark.parametrize("prefix", ["actor", "vel"])
def test_native_matches_numpy(npz_path, prefix):
    ref = NpzPolicy(npz_path, prefix=prefix)
    nat = NativePolicy(npz_path, prefix=prefix)
    rng = np.random.RandomState(1)
    obs = rng.randn(5, 47 * 15).astype(np.float32)
    got = nat(obs)
    want = ref(obs)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@needs_native
def test_native_single_obs_and_dims(npz_path):
    nat = NativePolicy(npz_path)
    assert nat.in_dim == 47 * 15 and nat.out_dim == 12
    out = nat(np.zeros(47 * 15, dtype=np.float32))
    assert out.shape == (12,)


@needs_native
def test_native_real_export(tmp_path):
    """Round-trip through the real exporter (flax params -> npz -> C++)."""
    jax = pytest.importorskip("jax")

    from humanoid_tpu.algo.networks import ActorCritic, init_params
    from humanoid_tpu.deploy.export import export_policy_npz

    net = ActorCritic(num_actions=12)
    params = init_params(jax.random.PRNGKey(0), net, 705, 219)
    path = export_policy_npz(params, str(tmp_path / "p.npz"))
    nat = NativePolicy(path)
    ref = NpzPolicy(path)
    obs = np.linspace(-1, 1, 705, dtype=np.float32)
    np.testing.assert_allclose(nat(obs), ref(obs), rtol=1e-5, atol=1e-5)
