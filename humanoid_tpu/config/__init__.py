from .structs import XBotLCfg, XBotLCfgPPO
