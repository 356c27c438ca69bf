from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.deepfm import DeepFM
from recommender_tpu.models.dien import DIEN, DIN, BaseModel
from recommender_tpu.models.esmm import ESMM, MMOE, MultiTaskBase
from recommender_tpu.models.eges import EGES, GES, DeepWalk
from recommender_tpu.models.pinsage import PinSage

__all__ = [
    "DLRM", "DeepFM",
    "BaseModel", "DIN", "DIEN",
    "MultiTaskBase", "ESMM", "MMOE",
    "DeepWalk", "GES", "EGES",
    "PinSage",
]
