"""humanoid_tpu: TPU-native humanoid RL training framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
humanoid-gym reference stack (Isaac Gym PhysX + torch PPO): batched
articulated rigid-body physics, the XBot-L walking task, a fused PPO
trainer, multi-chip env-axis sharding, and a MuJoCo sim2sim deployment gate.
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the flagship training graph takes
    minutes to compile; caching makes every subsequent process start in
    seconds. Opt out with HUMANOID_TPU_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("HUMANOID_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.environ.get("HOME", "/tmp"), ".cache", "humanoid_tpu_xla"
            ),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def _default_headless_gl() -> None:
    """MuJoCo latches its GL backend at first `import mujoco`
    (mujoco/rendering/classic/gl_context.py reads MUJOCO_GL at import), so
    the headless default must be set before anything imports it. Offscreen
    video capture (deploy/video.py) needs EGL in display-less containers."""
    import os

    if "MUJOCO_GL" not in os.environ and not os.environ.get("DISPLAY"):
        os.environ["MUJOCO_GL"] = "egl"


_enable_compilation_cache()
_default_headless_gl()
