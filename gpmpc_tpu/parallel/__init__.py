from gpmpc_tpu.parallel.mesh import make_mesh, shard_leading_axis, init_distributed
from gpmpc_tpu.parallel.batch import (
    batched_gpmpc_step,
    batched_episode,
    batched_episode_randomized,
    make_batched_controller_step,
)

__all__ = [
    "make_mesh",
    "shard_leading_axis",
    "init_distributed",
    "batched_gpmpc_step",
    "batched_episode",
    "batched_episode_randomized",
    "make_batched_controller_step",
]
