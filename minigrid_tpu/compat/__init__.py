from minigrid_tpu.compat.gym_env import GymnasiumAdapter, gym_make

__all__ = ["GymnasiumAdapter", "gym_make"]
