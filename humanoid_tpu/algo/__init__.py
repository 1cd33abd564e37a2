from .networks import ActorCritic
from .ppo import Batch, TrainState, init_train_state, ppo_update
from .runner import OnPolicyRunner
