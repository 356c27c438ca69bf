from recommender_tpu.embedding.table import Embedding, EmbeddingSpec
from recommender_tpu.embedding.sharded import (
    all_to_all_lookup,
    shard_table,
    sharded_lookup,
    sort_coalesced_lookup,
)
from recommender_tpu.embedding.planner import TableStats, plan_tables

__all__ = [
    "Embedding",
    "EmbeddingSpec",
    "all_to_all_lookup",
    "sharded_lookup",
    "sort_coalesced_lookup",
    "shard_table",
    "TableStats",
    "plan_tables",
]
