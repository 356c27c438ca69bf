from recommender_tpu.data.synthetic import SyntheticCTR
from recommender_tpu.data.pipeline import prefetch_to_device, batch_iterator

__all__ = ["SyntheticCTR", "prefetch_to_device", "batch_iterator"]
