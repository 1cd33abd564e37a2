"""Sweep launcher: grid expansion and immutable config override paths."""
from humanoid_tpu.config.structs import XBotLCfg, XBotLCfgPPO
from humanoid_tpu.scripts.sweep import _expand_grid, apply_point


def test_grid_cross_product():
    grid = list(_expand_grid({"a": [1, 2], "b": ["x", "y", "z"]}))
    assert len(grid) == 6
    assert {"a": 2, "b": "z"} in grid


def test_apply_point_nested_and_shared():
    env_cfg, train_cfg = XBotLCfg(), XBotLCfgPPO()
    point = {
        "seed": 7,
        "rewards.course_ratio": 1.001,
        "algorithm.num_learning_epochs": 3,
        "commands.ranges.lin_vel_x": [-0.5, 1.0],
    }
    e2, t2 = apply_point(env_cfg, train_cfg, point)
    assert e2.seed == 7 and t2.seed == 7          # shared field set on BOTH
    assert e2.rewards.course_ratio == 1.001
    assert t2.algorithm.num_learning_epochs == 3
    assert e2.commands.ranges.lin_vel_x == (-0.5, 1.0)  # list -> tuple
    # originals untouched (frozen dataclasses)
    assert env_cfg.seed != 7 and train_cfg.algorithm.num_learning_epochs == 2


def test_apply_point_unknown_path():
    try:
        apply_point(XBotLCfg(), XBotLCfgPPO(), {"nope.x": 1})
        raise AssertionError("expected KeyError")
    except KeyError:
        pass
