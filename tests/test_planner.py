"""Embedding sharding planner heuristics."""
import numpy as np

from recommender_tpu.embedding.planner import TableStats, plan_summary, plan_tables


def test_small_tables_replicate():
    plans = plan_tables(
        [TableStats("cat", vocab_size=1000, dim=18)], num_model_shards=8,
        batch_per_device=1024,
    )
    assert plans[0].partition is None and plans[0].lookup == "local"


def test_large_table_shards_with_a2a():
    plans = plan_tables(
        [TableStats("ids", vocab_size=10_000_000, dim=64, lookups_per_example=26)],
        num_model_shards=8,
        batch_per_device=8192,
    )
    p = plans[0]
    assert p.partition == "model"
    assert p.lookup == "all_to_all"  # 2BFD/m < BFD for m=8
    assert p.bytes_per_device == 10_000_000 * 64 * 4 // 8


def test_single_shard_always_local():
    plans = plan_tables(
        [TableStats("ids", vocab_size=10_000_000, dim=64)], num_model_shards=1,
        batch_per_device=8192,
    )
    assert plans[0].partition is None


def test_skew_raises_capacity():
    freq = np.ones(80000)
    freq[:10000] = 100.0  # hot head → first shard takes most traffic
    plans = plan_tables(
        [TableStats("ids", vocab_size=80000, dim=64, id_freq=freq,
                    lookups_per_example=26)],
        num_model_shards=8,
        batch_per_device=8192,
        replicate_below_bytes=1,
    )
    p = plans[0]
    assert p.lookup == "all_to_all"
    assert p.capacity_factor > 2.0  # skew detected

    uniform = plan_tables(
        [TableStats("ids", vocab_size=80000, dim=64, id_freq=np.ones(80000),
                    lookups_per_example=26)],
        num_model_shards=8,
        batch_per_device=8192,
        replicate_below_bytes=1,
    )[0]
    assert uniform.capacity_factor < p.capacity_factor

    print(plan_summary(plans))
