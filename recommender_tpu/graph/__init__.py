from recommender_tpu.graph.store import WeightedGraph
from recommender_tpu.graph.walks import random_walk, skipgram_pairs, LogUniformSampler

__all__ = ["WeightedGraph", "random_walk", "skipgram_pairs", "LogUniformSampler"]
