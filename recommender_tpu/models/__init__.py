from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.deepfm import DeepFM

__all__ = ["DLRM", "DeepFM"]
