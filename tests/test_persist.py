"""Persistence layer tests: config, document store, DAO semantics."""

import pytest

from colormipsearch_tpu.model import (
    CDMatch,
    ComputeFileType,
    EMNeuron,
    LMNeuron,
    ProcessingType,
)
from colormipsearch_tpu.persist import Config, DaosProvider
from colormipsearch_tpu.persist.requests import (
    NeuronSelector,
    PagedRequest,
    ScoresFilter,
    SortCriteria,
)


@pytest.fixture()
def daos(tmp_path):
    cfg = Config(overrides={"Store.Path": str(tmp_path / "db.sqlite")})
    return DaosProvider(cfg)


def _em(mip, name, lib="FlyEM_Hemibrain"):
    n = EMNeuron(mip_id=mip, published_name=name, library_name=lib,
                 alignment_space="AS")
    n.set_compute_file(ComputeFileType.InputColorDepthImage,
                       f"/imgs/{mip}.tif")
    return n


def test_config_layers(tmp_path):
    f = tmp_path / "my.properties"
    f.write_text("MongoDB.Database=custom\n# comment\nStore.Type=sqlite\n")
    cfg = Config(str(f))
    assert cfg.get("MongoDB.Database") == "custom"
    assert cfg.get("MongoDB.ConnectionURL").startswith("mongodb://")
    assert cfg.get_int("TimebasedId.Context") == 0


def test_neuron_create_or_update(daos):
    dao = daos.neuron_metadata_dao
    a = dao.create_or_update(_em("m1", "100"))
    first_id = a.entity_id
    assert first_id is not None
    # same (mipId, library, input) upserts onto the same entity
    b = dao.create_or_update(_em("m1", "100-renamed"))
    assert b.entity_id == first_id
    assert dao.find_by_id(first_id).published_name == "100-renamed"
    # different mip creates a new entity
    c = dao.create_or_update(_em("m2", "200"))
    assert c.entity_id != first_id


def test_neuron_selector_and_tags(daos):
    dao = daos.neuron_metadata_dao
    n1 = dao.save(_em("m1", "100"))
    n2 = dao.save(_em("m2", "200", lib="OtherLib"))
    sel = NeuronSelector(libraries=["FlyEM_Hemibrain"])
    found = dao.find_neurons(sel)
    assert [n.mip_id for n in found] == ["m1"]

    dao.add_processing_tags([n1, n2], ProcessingType.ColorDepthSearch,
                            ["run-1"])
    sel2 = NeuronSelector(
        processed_tags=[("ColorDepthSearch", "run-1")])
    assert len(dao.find_neurons(sel2)) == 2
    sel3 = NeuronSelector(processed_tags=[("GradientScore", "run-1")])
    assert len(dao.find_neurons(sel3)) == 0
    assert sorted(dao.distinct_mip_ids(NeuronSelector())) == ["m1", "m2"]


def test_cd_matches_upsert_and_join(daos):
    ndao = daos.neuron_metadata_dao
    mdao = daos.cd_matches_dao
    em = ndao.save(_em("em1", "111"))
    lm = ndao.save(LMNeuron(mip_id="lm1", published_name="lineX",
                            library_name="MCFO", slide_code="sc1"))

    m = CDMatch(mask_image=em, matched_image=lm,
                mask_image_ref_id=em.entity_id,
                matched_image_ref_id=lm.entity_id,
                matching_pixels=87, matching_pixels_ratio=0.05,
                normalized_score=0.05)
    assert mdao.create_or_update_all([m]) == 1
    mid = m.entity_id

    # upsert on the same (mask, matched) pair keeps one entity
    m2 = CDMatch(mask_image=em, matched_image=lm,
                 mask_image_ref_id=em.entity_id,
                 matched_image_ref_id=lm.entity_id,
                 matching_pixels=90, matching_pixels_ratio=0.06,
                 normalized_score=0.06)
    mdao.create_or_update_all([m2])
    assert m2.entity_id == mid

    # aggregation read embeds both neurons
    out = mdao.find_matches_by_mask(
        NeuronSelector(libraries=["FlyEM_Hemibrain"]))
    assert len(out) == 1
    assert out[0].mask_image.published_name == "111"
    assert out[0].matched_image.slide_code == "sc1"
    assert out[0].matching_pixels == 90

    # score filter + sort
    out2 = mdao.find_matches_by_mask(
        NeuronSelector(),
        scores_filter=ScoresFilter().add("matchingPixels", 95))
    assert out2 == []
    page = PagedRequest(sort=[SortCriteria("normalizedScore",
                                           ascending=False)])
    assert mdao.find_matches_by_mask(NeuronSelector(), page=page)

    # grad-score update path
    m2.gradient_area_gap = 1234
    m2.high_expression_area = 10
    m2.normalized_score = 42.5
    assert mdao.update_scores([m2]) == 1
    got = mdao.find_matches_by_mask(NeuronSelector())[0]
    assert got.gradient_area_gap == 1234
    assert got.normalized_score == pytest.approx(42.5)

    assert mdao.mask_mip_ids(NeuronSelector()) == ["em1"]


def test_store_persists_across_open(tmp_path):
    cfg = Config(overrides={"Store.Path": str(tmp_path / "p.sqlite")})
    d1 = DaosProvider(cfg)
    d1.neuron_metadata_dao.save(_em("m1", "100"))
    d1.store.close()
    d2 = DaosProvider(cfg)
    assert d2.neuron_metadata_dao.distinct_mip_ids(
        NeuronSelector()) == ["m1"]


def test_store_id_type_canonicalization(tmp_path):
    """_id is canonicalized to str on write and in filters: callers
    holding numeric entity ids must match documents regardless of which
    type the writer used (DB publishedURL enrichment queries by int)."""
    from colormipsearch_tpu.persist import Config
    from colormipsearch_tpu.persist.store import open_store

    cfg = Config()
    cfg._values["Store.Path"] = str(tmp_path / "ids.sqlite")
    store = open_store(cfg)
    col = store.collection("publishedURL")
    col.insert_many([{"_id": 123, "uploaded": {"cdm": "u"}},
                     {"_id": "456", "uploaded": {"cdm": "v"}}])
    assert len(col.find({"_id": {"$in": [123, 456]}})) == 2
    assert len(col.find({"_id": {"$in": ["123", "456"]}})) == 2
    assert col.find_one({"_id": 123})["uploaded"]["cdm"] == "u"
    assert col.find_one({"_id": "456"})["uploaded"]["cdm"] == "v"
    store.close()


def test_create_or_update_zip_entry_idempotent(tmp_path):
    """Re-importing a neuron whose input image is a ZIP ENTRY must match
    the existing document (the upsert key serializes the FileData the
    same way the document stores it), not duplicate it — and must
    preserve DB-accumulated processedTags/tags."""
    from colormipsearch_tpu.model import (
        ComputeFileType,
        LMNeuron,
        ProcessingType,
    )
    from colormipsearch_tpu.model.entities import FileData
    from colormipsearch_tpu.persist import Config, DaosProvider

    cfg_file = tmp_path / "c.properties"
    cfg_file.write_text(f"Store.Path={tmp_path}/z.sqlite\n")
    daos = DaosProvider(Config(str(cfg_file)))
    dao = daos.neuron_metadata_dao

    def mk():
        n = LMNeuron(mip_id="zm1", library_name="lib")
        n.set_compute_file(
            ComputeFileType.InputColorDepthImage,
            FileData("/archives/seg.zip", "inner/zm1.tif"))
        return n

    first = dao.create_or_update(mk())
    dao.add_processing_tags([first], ProcessingType.ColorDepthSearch,
                            ["run-1"])
    second = dao.create_or_update(mk())
    assert second.entity_id == first.entity_id
    assert dao._col.count({}) == 1
    # bookkeeping survived the re-import
    assert "run-1" in second.processed_tags[
        ProcessingType.ColorDepthSearch]
    stored = dao.find_by_id(first.entity_id)
    assert stored.has_processed_tag(ProcessingType.ColorDepthSearch,
                                    "run-1")
    daos.store.close()


def test_properties_first_separator_wins(tmp_path):
    """Java Properties splits at the FIRST '=' or ':' — a colon-keyed
    line whose value contains '=' must keep the full value."""
    from colormipsearch_tpu.persist import Config

    f = tmp_path / "p.properties"
    f.write_text(
        "MongoDB.ConnectionURL:mongodb://h/db?replicaSet=rs0\n"
        "Store.Path=/a/b:c\n")
    cfg = Config(str(f))
    assert cfg.get("MongoDB.ConnectionURL") == \
        "mongodb://h/db?replicaSet=rs0"
    assert cfg.get("Store.Path") == "/a/b:c"
