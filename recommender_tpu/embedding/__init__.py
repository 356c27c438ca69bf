from recommender_tpu.embedding.table import Embedding, EmbeddingSpec
from recommender_tpu.embedding.sharded import sharded_lookup, shard_table

__all__ = ["Embedding", "EmbeddingSpec", "sharded_lookup", "shard_table"]
