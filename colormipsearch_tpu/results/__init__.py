from colormipsearch_tpu.results.grouping import (
    ScoredEntry,
    group_by_mask,
    group_by_target,
    partition_collection,
    select_best_matches,
    select_top_ranked,
)

__all__ = [
    "ScoredEntry",
    "group_by_mask",
    "group_by_target",
    "partition_collection",
    "select_best_matches",
    "select_top_ranked",
]
