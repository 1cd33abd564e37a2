"""VecEnvAdapter: the reference's stateful env<->algo contract
(algo/vec_env.py:39-63) over the functional env; headless joystick."""
import numpy as np

from humanoid_tpu.config.structs import EnvCfg, XBotLCfg
from humanoid_tpu.env import VecEnvAdapter, XBotLEnv


def test_vec_env_contract():
    cfg = XBotLCfg(env=EnvCfg(num_envs=4))
    venv = VecEnvAdapter(XBotLEnv(cfg), seed=0)
    assert venv.num_envs == 4
    assert venv.num_obs == cfg.env.num_observations
    assert venv.num_actions == 12
    obs, priv = venv.reset()
    assert obs.shape == (4, venv.num_obs)
    assert priv.shape == (4, venv.num_privileged_obs)
    a = np.zeros((4, venv.num_actions), dtype=np.float32)
    obs2, priv2, rew, reset, extras = venv.step(a)
    assert obs2.shape == obs.shape and rew.shape == (4,)
    assert "time_outs" in extras and "episode" in extras
    assert f"rew_{venv.env.reward_names[0]}" in extras["episode"]
    assert venv.get_observations() is obs2
    assert np.all(np.asarray(venv.episode_length_buf) >= 0)


def test_joystick_headless_zero_commands():
    import os

    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    from humanoid_tpu.scripts.joystick import JoystickController, _shape

    pad = JoystickController()
    cmd = pad.get_cmd_vel()
    assert cmd == {"vx": 0.0, "vy": 0.0, "wz": 0.0}
    assert pad.get_button_press()["A"] == 0
    # cosine shaping: odd, saturating, forward stick (negative) -> +v
    assert _shape(-1.0) == 1.0
    assert _shape(1.0) == -1.0
    assert _shape(0.0) == 0.0
    assert abs(_shape(-0.5)) < 1.0
