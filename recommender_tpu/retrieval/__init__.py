from recommender_tpu.retrieval.eval import (
    full_corpus_reprs,
    recommend_topk,
    hit_rate,
)

__all__ = ["full_corpus_reprs", "recommend_topk", "hit_rate"]
