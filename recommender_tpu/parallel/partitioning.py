"""Param/opt-state partitioning: flax metadata → NamedShardings.

The reference's only distribution story is replicated variables under
``MirroredStrategy`` (SURVEY.md §2.6). Here, parameters declare their
layout via ``nn.with_partitioning`` metadata (e.g. embedding tables
row-sharded over ``model``); everything else is replicated; optimizer
state mirrors the parameter layout (Adam moments of a row-sharded table
are row-sharded too, so the update is fully shard-local).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_pspecs(boxed_variables: Any) -> Any:
    """PartitionSpec pytree from (possibly boxed) variables."""
    return nn.get_partition_spec(boxed_variables)


def _to_named(spec_tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s if isinstance(s, P) else P()),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def param_shardings(boxed_params: Any, mesh: Mesh) -> Any:
    return _to_named(param_pspecs(boxed_params), mesh)


def validate_divisibility(boxed_params: Any, mesh: Mesh) -> None:
    """Raise a clear error when a Partitioned param's sharded dim is not
    divisible by its mesh axis — e.g. restoring a vocab-252 row-sharded
    table onto ``model=8``. GSPMD would silently pad the shards, and the
    shard-local lookup/update paths (embedding/sharded.py) would then
    address phantom rows: a wrong result, not a crash. Checked at
    ``Trainer.init_state`` so both fresh runs and cross-mesh checkpoint
    restores fail loudly at state-building time."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(
        boxed_params, is_leaf=lambda x: isinstance(x, nn.Partitioned)
    )[0]:
        if not isinstance(leaf, nn.Partitioned):
            continue
        shape = leaf.value.shape
        for dim, name in enumerate(leaf.names):
            if name is None:
                continue
            axis = mesh.shape[name]
            if shape[dim] % axis:
                pstr = jax.tree_util.keystr(path)
                raise ValueError(
                    f"param {pstr} dim {dim} (size {shape[dim]}) is sharded "
                    f"over mesh axis '{name}' (size {axis}) but is not "
                    f"divisible by it; pad the vocab to a multiple of the "
                    f"axis size or restore onto a compatible mesh"
                )


def opt_state_shardings(opt_state: Any, params: Any, param_spec: Any, mesh: Mesh) -> Any:
    """Mirror param specs onto every params-shaped subtree of the opt state.

    Optax states embed zero or more pytrees with the params' treedef (Adam's
    mu/nu); those inherit the param layout; scalar counters replicate.
    """
    p_struct = jax.tree_util.tree_structure(params)

    def is_params_like(x):
        try:
            return jax.tree_util.tree_structure(x) == p_struct
        except Exception:
            return False

    def map_subtree(x):
        if is_params_like(x):
            return _to_named(param_spec, mesh)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(map_subtree, opt_state, is_leaf=is_params_like)


def state_shardings(state, params_sharding, mesh: Mesh):
    """Shardings for a TrainState: params per metadata, rest replicated-or-mirrored."""
    import dataclasses

    from recommender_tpu.core.train import TrainState  # circular-safe at call time

    assert isinstance(state, TrainState)
    rep = NamedSharding(mesh, P())
    pspec = jax.tree_util.tree_map(
        lambda ns: ns.spec, params_sharding, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    return dataclasses.replace(
        state,
        step=rep,
        params=params_sharding,
        opt_state=opt_state_shardings(state.opt_state, state.params, pspec, mesh),
        model_state=jax.tree_util.tree_map(lambda _: rep, state.model_state),
    )
