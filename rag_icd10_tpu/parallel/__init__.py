from .mesh import make_mesh, param_shardings, batch_sharding
from .search import ShardedFlatSearcher
from .train import contrastive_train_step, init_train_state

__all__ = [
    "make_mesh",
    "param_shardings",
    "batch_sharding",
    "ShardedFlatSearcher",
    "contrastive_train_step",
    "init_train_state",
]
