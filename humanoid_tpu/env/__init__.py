from .vec_env import VecEnvAdapter
from .xbotl import EnvState, StepOutput, XBotLEnv
