from recommender_tpu.core.mesh import MeshSpec, make_mesh, data_sharding, replicated
from recommender_tpu.core.metrics import StreamingAUC, auc_from_state
from recommender_tpu.core.train import TrainState, Trainer, TrainConfig

__all__ = [
    "MeshSpec",
    "make_mesh",
    "data_sharding",
    "replicated",
    "StreamingAUC",
    "auc_from_state",
    "TrainState",
    "Trainer",
    "TrainConfig",
]
