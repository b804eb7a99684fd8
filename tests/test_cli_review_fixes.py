"""Regression tests for CLI-layer review findings (round 2 self-review):

  * --excluded-mips survives argparse @argfile expansion (JSON-array and
    line-per-id forms) and accepts plain .json paths
  * FS results mode without --outputDir fails loudly instead of silently
    discarding computed results
  * PPPMatch persists maskImageRefId/matchedImageRefId
  * validateDBData dangling-ref check uses the FULL neuron id set, not
    the selector-filtered subset
"""

import json

import pytest


def run_cli(*argv):
    from colormipsearch_tpu.cli.main import main
    return main([str(a) for a in argv])


# -------------------------------------------------------------------------
# --excluded-mips forms
# -------------------------------------------------------------------------


def test_excluded_mips_inline_and_at_file(tmp_path):
    from colormipsearch_tpu.cli.commands import _load_excluded_mips

    f = tmp_path / "ids.json"
    f.write_text('["mip1", {"mipId": "mip2"}, {"id": "mip3"}]')
    lines = tmp_path / "ids.txt"
    lines.write_text("a1\na2\n\n")

    assert _load_excluded_mips(["x", "y"]) == {"x", "y"}
    assert _load_excluded_mips([f"@{f}"]) == {"mip1", "mip2", "mip3"}
    assert _load_excluded_mips([f"@{lines}"]) == {"a1", "a2"}
    # plain path to a .json list file
    assert _load_excluded_mips([str(f)]) == {"mip1", "mip2", "mip3"}
    # argparse fromfile expansion of a one-line JSON array arrives as
    # a single "[...]" token
    assert _load_excluded_mips(['["mip1", "mip2"]']) == {"mip1", "mip2"}


def test_excluded_mips_through_argparse_at_expansion(tmp_path):
    """The parser's fromfile_prefix_chars consumes @tokens BEFORE
    parsing; both file layouts must still reach the excluded set."""
    from colormipsearch_tpu.cli.commands import _load_excluded_mips
    from colormipsearch_tpu.cli.main import build_parser

    j = tmp_path / "ids.json"
    j.write_text('["mip1", "mip2"]')  # one line -> one expanded token
    t = tmp_path / "ids.txt"
    t.write_text("a1\na2\n")          # one token per line

    for spec, expect in ((j, {"mip1", "mip2"}), (t, {"a1", "a2"})):
        args = build_parser().parse_args(
            ["colorDepthSearch", "-m", "m.json", "-i", "t.json",
             "--excluded-mips", f"@{spec}"])
        assert _load_excluded_mips(args.excluded_mips) == expect


# -------------------------------------------------------------------------
# FS mode requires --outputDir
# -------------------------------------------------------------------------


def test_fs_results_without_output_dir_fails(tmp_path, capsys):
    (tmp_path / "empty").mkdir()
    rc = run_cli("gradientScores", "-md", tmp_path / "empty")
    assert rc == 2
    assert "--outputDir is required" in capsys.readouterr().err

    rc = run_cli("normalizeGradientScores", "-md", tmp_path / "empty")
    assert rc == 2


def test_out_dirs_helper():
    import argparse

    from colormipsearch_tpu.cli.commands import _out_dirs

    ns = argparse.Namespace(outputDir=None, perMaskSubdir=None,
                            perTargetSubdir=None)
    assert _out_dirs(ns) == (None, None)
    with pytest.raises(ValueError, match="outputDir"):
        _out_dirs(ns, required=True)


# -------------------------------------------------------------------------
# PPPMatch ref ids
# -------------------------------------------------------------------------


def test_ppp_match_ref_ids_roundtrip():
    from colormipsearch_tpu.model import PPPMatch

    m = PPPMatch(mask_image_ref_id=1234, matched_image_ref_id=5678,
                 source_em_name="em1", rank=1.0)
    doc = m.to_json()
    assert doc["maskImageRefId"] == "1234"
    assert doc["matchedImageRefId"] == "5678"
    back = PPPMatch.from_json(doc)
    assert back.mask_image_ref_id == 1234
    assert back.matched_image_ref_id == 5678


def test_import_ppp_db_persists_mask_ref(tmp_path):
    """importPPPResults --results-storage DB stores maskImageRefId on the
    pppMatches documents (the declared index key)."""
    ppp_dir = ("/root/reference/colormipsearch-api/src/test/resources/"
               "colormipsearch/api/pppsearch")
    import os
    src = None
    for root, _dirs, files in os.walk(ppp_dir):
        for f in files:
            if f.startswith("cov_scores_") and f.endswith(".json"):
                src = os.path.join(root, f)
                break
        if src:
            break
    if src is None:
        pytest.skip("no reference PPP fixture")
    cfg = tmp_path / "c.properties"
    cfg.write_text(f"Store.Path={tmp_path}/db.sqlite\n")
    assert run_cli("importPPPResults", "-rf", src,
                   "--results-storage", "DB", "--config", cfg) == 0
    from colormipsearch_tpu.persist import Config, DaosProvider

    daos = DaosProvider(Config(str(cfg)))
    docs = list(daos.ppp_matches_dao._col.find({}))
    assert docs
    assert all(d.get("maskImageRefId") for d in docs)
    daos.store.close()


# -------------------------------------------------------------------------
# validateDBData dangling refs vs selector scope
# -------------------------------------------------------------------------


def test_validate_dangling_uses_full_neuron_set(tmp_path, capsys):
    from colormipsearch_tpu.model import CDMatch, EMNeuron, LMNeuron
    from colormipsearch_tpu.persist import Config, DaosProvider

    cfg = tmp_path / "c.properties"
    cfg.write_text(f"Store.Path={tmp_path}/db.sqlite\n")
    daos = DaosProvider(Config(str(cfg)))
    em = EMNeuron(mip_id="em1", published_name="1", library_name="em")
    lm = LMNeuron(mip_id="lm1", published_name="2", library_name="lm")
    for n in (em, lm):
        daos.neuron_metadata_dao.create_or_update(n)
    m = CDMatch(mask_image=em, matched_image=lm, matching_pixels=10,
                mask_image_ref_id=em.entity_id,
                matched_image_ref_id=lm.entity_id)
    daos.cd_matches_dao.create_or_update_all([m])
    daos.store.close()

    # selector narrows validation to the EM library; the match's LM side
    # is outside the page but NOT dangling
    assert run_cli("validateDBData", "--results-storage", "DB",
                   "--config", cfg, "-l", "em", "--no-check-files") == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["neuronsChecked"] == 1
    assert rep["danglingMatchRefs"] == 0

    # delete the LM neuron -> the ref really is dangling now
    daos = DaosProvider(Config(str(cfg)))
    daos.neuron_metadata_dao._col.delete_many({"_id": str(lm.entity_id)})
    daos.store.close()
    assert run_cli("validateDBData", "--results-storage", "DB",
                   "--config", cfg, "-l", "em", "--no-check-files") == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["danglingMatchRefs"] == 1
