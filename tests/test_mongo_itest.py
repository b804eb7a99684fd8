"""Gated integration test against a REAL MongoDB server.

The reference runs its DAO ITests against a live mongod configured by
nbdb_itest.properties (colormipsearch-persist/src/itest/.../
AbstractITest.java:10-16, `-P itest`); this is the same gate for the
Mongo backend here: it runs only when pymongo is importable AND a
server answers at MONGO_ITEST_URL (default mongodb://localhost:27017)
— otherwise it SKIPS, keeping CI hermetic like the reference's default
profile.  The fake-server suite (tests/test_mongo_store.py) covers the
filter-translation semantics unconditionally.

Run it with e.g.:
    MONGO_ITEST_URL=mongodb://localhost:27017 \
        python -m pytest tests/test_mongo_itest.py -v
"""

import os
import uuid

import pytest

from colormipsearch_tpu.model import CDMatch, ComputeFileType
from colormipsearch_tpu.model.entities import EMNeuron, LMNeuron
from colormipsearch_tpu.persist import Config, DaosProvider
from colormipsearch_tpu.persist.requests import (
    NeuronSelector,
    ScoresFilter,
)

MONGO_URL = os.environ.get("MONGO_ITEST_URL",
                           "mongodb://localhost:27017")


def _live_client():
    pymongo = pytest.importorskip(
        "pymongo", reason="pymongo not installed")
    client = pymongo.MongoClient(
        MONGO_URL, serverSelectionTimeoutMS=1500,
        connectTimeoutMS=1500)
    try:
        client.admin.command("ping")
    except Exception as e:  # noqa: BLE001 - any failure means no server
        pytest.skip(f"no MongoDB server at {MONGO_URL}: {e}")
    return client


@pytest.fixture()
def daos():
    from colormipsearch_tpu.persist.mongo_store import MongoStore

    client = _live_client()
    # a throwaway database per run, dropped afterwards (the reference
    # itests point at a dedicated itest database the same way)
    db_name = f"cmtpu_itest_{uuid.uuid4().hex[:12]}"
    cfg = Config(overrides={"Store.Type": "mongo",
                            "MongoDB.ConnectionURL": MONGO_URL,
                            "MongoDB.Database": db_name})
    store = MongoStore(cfg, client=client)
    provider = DaosProvider(cfg, store=store)
    yield provider
    client.drop_database(db_name)
    client.close()


def test_real_mongo_dao_roundtrip(daos):
    """CRUD + upsert-by-image-refs + the aggregation-style mask read
    with selectors and match tags, against the live server."""
    ndao = daos.neuron_metadata_dao
    mdao = daos.cd_matches_dao

    em = EMNeuron(mip_id="em1", published_name="100",
                  library_name="FlyEM", alignment_space="AS")
    em.set_compute_file(ComputeFileType.InputColorDepthImage,
                        "/imgs/em1.tif")
    lm = LMNeuron(mip_id="lm1", published_name="L1",
                  library_name="SplitGal4", alignment_space="AS")
    lm.tags.add("prod")
    ndao.create_or_update(em)
    ndao.create_or_update(lm)
    # idempotent upsert keyed on (mipId, library, computeFiles)
    em2 = EMNeuron(mip_id="em1", published_name="100",
                   library_name="FlyEM", alignment_space="AS")
    em2.set_compute_file(ComputeFileType.InputColorDepthImage,
                         "/imgs/em1.tif")
    ndao.create_or_update(em2)
    assert em2.entity_id == em.entity_id
    assert len(ndao.find_neurons(NeuronSelector())) == 2

    m = CDMatch(mask_image=em, matched_image=lm, matching_pixels=87,
                matching_pixels_ratio=0.045, mirrored=False)
    m.mask_image_ref_id = em.entity_id
    m.matched_image_ref_id = lm.entity_id
    m.tags.add("run-1")
    assert mdao.create_or_update_all([m]) == 1
    # upsert on (maskImageRefId, matchedImageRefId): no duplicate row
    # (a re-run REPLACES the doc, so it carries the same tag)
    m2 = CDMatch(mask_image=em, matched_image=lm, matching_pixels=90,
                 matching_pixels_ratio=0.05)
    m2.mask_image_ref_id = em.entity_id
    m2.matched_image_ref_id = lm.entity_id
    m2.tags.add("run-1")
    assert mdao.create_or_update_all([m2]) == 1
    assert mdao._col.count() == 1

    got = mdao.find_matches_by_mask(
        NeuronSelector(mip_ids=["em1"]),
        target_selector=NeuronSelector(tags=["prod"]),
        scores_filter=ScoresFilter().add("matchingPixelsRatio", 0.01),
        match_tags=["run-1"])
    assert len(got) == 1
    assert got[0].mask_image.mip_id == "em1"
    assert got[0].matched_image.mip_id == "lm1"

    # a match tag nothing carries selects nothing
    assert mdao.find_matches_by_mask(
        NeuronSelector(mip_ids=["em1"]),
        match_tags=["no-such"]) == []

    # score-only updates persist
    got[0].gradient_area_gap = 2438
    got[0].high_expression_area = 0
    got[0].normalized_score = 998.348
    assert mdao.update_scores(got) == 1
    back = mdao.find_matches_by_mask(NeuronSelector(mip_ids=["em1"]))
    assert back[0].gradient_area_gap == 2438
