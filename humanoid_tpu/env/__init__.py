from .xbotl import EnvState, StepOutput, XBotLEnv
