from recommender_tpu.ops.embedding_kernels import (
    embedding_lookup,
    padded_scatter_add,
    scatter_add_dense,
    sorted_scatter_add,
)

__all__ = [
    "embedding_lookup",
    "padded_scatter_add",
    "scatter_add_dense",
    "sorted_scatter_add",
]
