from recommender_tpu.ops.embedding_kernels import (
    embedding_lookup,
    sorted_scatter_add,
)

__all__ = ["embedding_lookup", "sorted_scatter_add"]
