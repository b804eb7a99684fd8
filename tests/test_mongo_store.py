"""Mongo backend tests against an in-memory fake pymongo server.

Validates MongoStore's filter translation and Collection semantics (the
layer between our DAOs and pymongo) without a server, the way the
reference keeps real-Mongo tests behind its itest profile
(colormipsearch-persist/src/itest).  The fake implements the exact
pymongo surface MongoStore calls, with Mongo's matching semantics
(array-membership equality, null == missing).
"""

import sys
import types

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
    ScoresFilter,
)


# ---------------------------------------------------------------------------
# fake pymongo
# ---------------------------------------------------------------------------


def _mongo_get(doc, path):
    cur = doc
    for part in path.split("."):
        if not isinstance(cur, dict):
            return None
        cur = cur.get(part)
    return cur


def _mongo_match_cond(val, cond):
    if isinstance(cond, dict) and any(k.startswith("$") for k in cond):
        for op, arg in cond.items():
            if op == "$in":
                ok = (any(v in arg for v in val)
                      if isinstance(val, list) else val in arg)
            elif op == "$nin":
                ok = not (any(v in arg for v in val)
                          if isinstance(val, list) else val in arg)
            elif op == "$ne":
                # Mongo: $ne on an array excludes membership too
                ok = not (val == arg or
                          (isinstance(val, list) and arg in val))
            elif op == "$eq":
                # Mongo: $eq matches array membership like bare equality
                ok = (val == arg or
                      (isinstance(val, list) and arg in val))
            elif op == "$gte":
                ok = val is not None and val >= arg
            elif op == "$gt":
                ok = val is not None and val > arg
            elif op == "$lte":
                ok = val is not None and val <= arg
            elif op == "$exists":
                ok = (val is not None) == bool(arg)
            else:
                raise ValueError(f"fake pymongo: unsupported {op}")
            if not ok:
                return False
        return True
    # plain equality: Mongo also matches array membership
    if isinstance(val, list):
        return cond in val or val == cond
    return val == cond


def _mongo_match(doc, filt):
    for key, cond in (filt or {}).items():
        if key == "$or":
            if not any(_mongo_match(doc, sub) for sub in cond):
                return False
            continue
        if not _mongo_match_cond(_mongo_get(doc, key), cond):
            return False
    return True


class FakeCursor(list):
    def sort(self, spec):
        out = list(self)
        for key, direction in reversed(spec):
            out.sort(key=lambda d: (d.get(key) is None, d.get(key) or 0)
                     if isinstance(d.get(key), (int, float, type(None)))
                     else (False, str(d.get(key))),
                     reverse=direction < 0)
        return FakeCursor(out)

    def skip(self, n):
        return FakeCursor(self[n:])

    def limit(self, n):
        return FakeCursor(self[:n])


class FakeMongoCollection:
    def __init__(self, name):
        self.name = name
        self.docs = {}
        self.indexes = []

    def create_index(self, field):
        self.indexes.append(field)

    def bulk_write(self, ops, ordered=True):
        upserted = matched = 0
        for op in ops:
            doc_id = op.filter["_id"]
            if doc_id in self.docs:
                matched += 1
            else:
                upserted += 1
            self.docs[doc_id] = dict(op.replacement)
        return types.SimpleNamespace(upserted_count=upserted,
                                     matched_count=matched,
                                     modified_count=matched)

    def replace_one(self, filt, doc, upsert=False):
        self.docs[filt["_id"]] = dict(doc)

    def update_one(self, filt, update):
        d = self.docs.get(filt["_id"])
        if d is None:
            return types.SimpleNamespace(matched_count=0)
        d.update(update["$set"])
        return types.SimpleNamespace(matched_count=1)

    def delete_many(self, filt):
        rm = [k for k, d in self.docs.items() if _mongo_match(d, filt)]
        for k in rm:
            del self.docs[k]
        return types.SimpleNamespace(deleted_count=len(rm))

    def find(self, filt=None):
        return FakeCursor(dict(d) for d in self.docs.values()
                          if _mongo_match(d, filt))

    def find_one(self, filt=None):
        for d in self.docs.values():
            if _mongo_match(d, filt):
                return dict(d)
        return None

    def count_documents(self, filt=None):
        return len(self.find(filt))

    def distinct(self, field, filt=None):
        out, seen = [], set()
        for d in self.find(filt):
            v = _mongo_get(d, field)
            vals = v if isinstance(v, list) else [v]
            for x in vals:
                if x is not None and x not in seen:
                    seen.add(x)
                    out.append(x)
        return out


class FakeMongoClient:
    def __init__(self):
        self.dbs = {}

    def __getitem__(self, name):
        return self.dbs.setdefault(name, FakeDb())

    def close(self):
        pass


class FakeDb(dict):
    def __missing__(self, name):
        col = FakeMongoCollection(name)
        self[name] = col
        return col


@pytest.fixture()
def fake_pymongo(monkeypatch):
    """Install a minimal pymongo module (ReplaceOne only)."""
    mod = types.ModuleType("pymongo")

    class ReplaceOne:
        def __init__(self, filter, replacement, upsert=False):
            self.filter = filter
            self.replacement = replacement
            self.upsert = upsert

    mod.ReplaceOne = ReplaceOne
    mod.MongoClient = lambda *a, **k: FakeMongoClient()
    monkeypatch.setitem(sys.modules, "pymongo", mod)
    return mod


@pytest.fixture()
def daos(fake_pymongo):
    from colormipsearch_tpu.persist.mongo_store import MongoStore

    cfg = Config(overrides={"Store.Type": "mongo"})
    store = MongoStore(cfg, client=FakeMongoClient())
    return DaosProvider(cfg, store=store)


def _em(mip, name, lib="FlyEM_Hemibrain"):
    n = EMNeuron(mip_id=mip, published_name=name, library_name=lib,
                 alignment_space="AS")
    n.set_compute_file(ComputeFileType.InputColorDepthImage,
                       f"/imgs/{mip}.tif")
    return n


def test_open_store_dispatches_to_mongo(fake_pymongo, tmp_path):
    from colormipsearch_tpu.persist.store import open_store
    from colormipsearch_tpu.persist.mongo_store import MongoStore

    cfg = Config(overrides={"Store.Type": "mongo"})
    store = open_store(cfg)
    assert isinstance(store, MongoStore)


def test_neuron_create_or_update(daos):
    dao = daos.neuron_metadata_dao
    n = _em("m1", "1234")
    dao.create_or_update(n)
    again = _em("m1", "1234")
    dao.create_or_update(again)
    assert again.entity_id == n.entity_id
    assert len(dao.find_neurons(NeuronSelector())) == 1


def test_selector_tags_and_library(daos):
    dao = daos.neuron_metadata_dao
    a = _em("m1", "1", lib="libA")
    a.tags.add("t1")
    b = _em("m2", "2", lib="libB")
    dao.create_or_update(a)
    dao.create_or_update(b)
    sel = NeuronSelector(libraries=["libA"])
    got = dao.find_neurons(sel)
    assert [n.mip_id for n in got] == ["m1"]
    got = dao.find_neurons(NeuronSelector(tags=["t1"]))
    assert [n.mip_id for n in got] == ["m1"]
    assert sorted(dao.distinct_mip_ids(NeuronSelector())) == ["m1", "m2"]


def test_matches_upsert_and_join(daos):
    ndao = daos.neuron_metadata_dao
    mdao = daos.cd_matches_dao
    mask = _em("em1", "100")
    target = LMNeuron(mip_id="lm1", published_name="line1",
                      library_name="lmlib", alignment_space="AS")
    ndao.create_or_update(mask)
    ndao.create_or_update(target)

    m = CDMatch(mask_image_ref_id=mask.entity_id,
                matched_image_ref_id=target.entity_id,
                matching_pixels=87, matching_pixels_ratio=0.05,
                normalized_score=0.05, match_found=True)
    assert mdao.create_or_update_all([m]) == 1
    # upsert on same (mask, target) pair keeps one row
    m2 = CDMatch(mask_image_ref_id=mask.entity_id,
                 matched_image_ref_id=target.entity_id,
                 matching_pixels=90, matching_pixels_ratio=0.06,
                 normalized_score=0.06, match_found=True)
    mdao.create_or_update_all([m2])
    found = mdao.find_matches_by_mask(NeuronSelector(mip_ids=["em1"]))
    assert len(found) == 1
    assert found[0].matching_pixels == 90
    assert found[0].mask_image.mip_id == "em1"
    assert found[0].matched_image.mip_id == "lm1"
    # scores filter path
    sf = ScoresFilter().add("matchingPixels", 95)
    assert mdao.find_matches_by_mask(NeuronSelector(), None, sf) == []


def test_update_scores_and_processing_tags(daos):
    ndao = daos.neuron_metadata_dao
    mdao = daos.cd_matches_dao
    mask = _em("em1", "100")
    target = _em("lm1", "200")
    ndao.create_or_update(mask)
    ndao.create_or_update(target)
    m = CDMatch(mask_image_ref_id=mask.entity_id,
                matched_image_ref_id=target.entity_id,
                matching_pixels=10, matching_pixels_ratio=0.01,
                normalized_score=0.01, match_found=True)
    mdao.create_or_update_all([m])
    m.gradient_area_gap = 123
    m.high_expression_area = 7
    m.normalized_score = 42.0
    assert mdao.update_scores([m]) == 1
    got = mdao.find_matches_by_mask(NeuronSelector(mip_ids=["em1"]))[0]
    assert got.gradient_area_gap == 123 and got.normalized_score == 42.0

    ndao.add_processing_tags([mask], ProcessingType.ColorDepthSearch,
                             ["run1"])
    sel = NeuronSelector(processed_tags=[
        (ProcessingType.ColorDepthSearch.value, "run1")])
    assert [n.mip_id for n in ndao.find_neurons(sel)] == ["em1"]


def test_filter_translation_semantics():
    from colormipsearch_tpu.persist.mongo_store import _translate_filter

    # $contains -> $eq (array membership in Mongo, composable with
    # sibling operators unlike the bare-equality form)
    assert _translate_filter({"tags": {"$contains": "x"}}) == \
        {"tags": {"$eq": "x"}}
    # $exists on VALUES: True -> non-null, False -> null-or-missing
    assert _translate_filter({"f": {"$exists": True}}) == \
        {"f": {"$ne": None}}
    assert _translate_filter({"f": {"$exists": False}}) == \
        {"f": {"$eq": None}}
    # $or recurses
    out = _translate_filter(
        {"$or": [{"a": 1}, {"b": {"$contains": "y"}}]})
    assert out == {"$or": [{"a": 1}, {"b": {"$eq": "y"}}]}
    # pass-through operators
    assert _translate_filter({"n": {"$gte": 3}}) == {"n": {"$gte": 3}}
