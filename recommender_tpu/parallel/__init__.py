from recommender_tpu.parallel.partitioning import (
    param_shardings,
    opt_state_shardings,
    state_shardings,
)

__all__ = ["param_shardings", "opt_state_shardings", "state_shardings"]
