from minigrid_tpu.models.actor_critic import ActorCritic, init_params
from minigrid_tpu.models.ppo import PPOConfig, make_optimizer, make_train_step
from minigrid_tpu.models.train import TrainConfig, train

__all__ = [
    "ActorCritic", "init_params", "PPOConfig", "make_optimizer",
    "make_train_step", "TrainConfig", "train",
]
