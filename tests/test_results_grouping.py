"""Direct unit tests for results/grouping.py, mirroring the reference's
ItemsHandlingTest.java semantics."""

import numpy as np
import pytest

from colormipsearch_tpu.model import CDMatch, EMNeuron, LMNeuron
from colormipsearch_tpu.results.grouping import (
    group_by_mask,
    group_by_target,
    partition_collection,
    select_best_matches,
    select_top_ranked,
    sort_matches_desc,
)


def _matches():
    """3 lines x (2-3 samples) with distinct pixel scores."""
    em = EMNeuron(mip_id="em", published_name="111")
    out = []
    scores = {"lineA": [10, 40, 30], "lineB": [50, 20], "lineC": [5, 60]}
    for line, px_list in scores.items():
        for i, px in enumerate(px_list):
            lm = LMNeuron(mip_id=f"{line}-{i}", published_name=line,
                          slide_code=f"{line}_s{i}")
            out.append(CDMatch(mask_image=em, matched_image=lm,
                               matching_pixels=px,
                               matching_pixels_ratio=px / 1000))
    return out


def test_partition_collection():
    parts = partition_collection(list(range(10)), 3)
    assert [len(p) for p in parts] == [3, 3, 3, 1]
    assert [p[0] for p in parts] == [0, 3, 6, 9]
    # partition sizes <= 1 degrade to singletons (ItemsHandling:73-79)
    assert [len(p) for p in partition_collection([1, 2], 1)] == [1, 1]


def test_select_top_ranked_all():
    ms = _matches()
    entries = select_top_ranked(
        ms, lambda m: m.matched_image.published_name,
        lambda m: m.matching_pixels, -1, -1)
    assert len(entries) == 3
    # groups ranked by their best score desc: lineC(60), lineB(50), lineA(40)
    assert [e.name for e in entries] == ["lineC", "lineB", "lineA"]
    by_name = {e.name: e for e in entries}
    assert len(by_name["lineA"].entry) == 3
    # within a group, entries sorted desc
    assert [m.matching_pixels for m in by_name["lineA"].entry] == \
        [40, 30, 10]


def test_select_top_ranked_limits():
    ms = _matches()
    for k in (1, 2):
        entries = select_top_ranked(
            ms, lambda m: m.matched_image.published_name,
            lambda m: m.matching_pixels, -1, k)
        assert all(len(e.entry) <= k for e in entries)
    top2 = select_top_ranked(
        ms, lambda m: m.matched_image.published_name,
        lambda m: m.matching_pixels, 2, -1)
    assert [e.name for e in top2] == ["lineC", "lineB"]


def test_select_top_ranked_blank_group_is_unknown():
    ms = _matches()
    for m in ms:
        m.matched_image.published_name = ""
    [entry] = select_top_ranked(
        ms, lambda m: m.matched_image.published_name,
        lambda m: m.matching_pixels, -1, -1)
    assert entry.name == "UNKNOWN"
    assert len(entry.entry) == len(ms)


def test_select_best_matches_pipeline():
    """Top lines -> top samples/line -> top matches/sample
    (ColorMIPProcessUtils.selectBestMatches)."""
    ms = _matches()
    best = select_best_matches(ms, 2, 1, 1)
    # 2 best lines (lineC, lineB), 1 sample each, 1 match per sample
    assert len(best) == 2
    assert sorted(m.matching_pixels for m in best) == [50, 60]


def test_group_round_trip():
    ms = _matches()
    grouped = group_by_mask(ms)
    assert len(grouped) == 1  # one mask
    total = sum(len(group) for _mask, group in grouped)
    assert total == len(ms)
    by_target = group_by_target(ms)
    assert len(by_target) == len(ms)  # every target mip unique here
    ordered = sort_matches_desc(ms)
    scores = [m.matching_pixels for m in ordered]
    assert scores == sorted(scores, reverse=True)


def test_eliminate_duplicates_by_id():
    """UtilsTest.eliminateDuplicateResults: group by id with sub-limit 1
    keeps one entry per id (api_v2 UtilsTest.java:83-103)."""
    em = EMNeuron(mip_id="em", published_name="1")
    rows = []
    for tid, img in [("10", "i1.1"), ("10", "i1.2"), ("20", "i1.1"),
                     ("30", "i1.1"), ("30", "i1.2")]:
        lm = LMNeuron(mip_id=f"{tid}-{img}", published_name=tid)
        rows.append(CDMatch(mask_image=em, matched_image=lm,
                            matching_pixels=10, matching_pixels_ratio=0.01))
    dedup = select_top_ranked(
        rows, lambda m: m.matched_image.published_name,
        lambda m: m.matching_pixels, -1, 1)
    flat = [e for entry in dedup for e in entry.entry]
    assert len(flat) == 3
    assert sorted(e.matched_image.published_name for e in flat) == \
        ["10", "20", "30"]
