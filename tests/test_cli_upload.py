"""uploadData publish step (upload-data.sh equivalent): plan, manifest,
dry-run, and the executed path with a fake uploader command."""

import json
import sys

import pytest

from colormipsearch_tpu.cli.main import main as cli_main


def _mk_tree(root):
    """An exportData-shaped local data tree (upload-data.sh layout)."""
    for region in ("brain", "vnc"):
        for sub, direction in (("cdmatches", "em-vs-lm"),
                               ("cdmatches", "lm-vs-em"),
                               ("pppmatches", "em-vs-lm")):
            d = root / region / sub / direction
            d.mkdir(parents=True)
            (d / "m1.json").write_text("{}")
    for mt in ("lmlines", "embodies"):
        d = root / "brain+vnc" / "mips" / mt
        d.mkdir(parents=True)
        (d / "a.json").write_text("{}")
        (d / "b.json").write_text("{}")
    (root / "config.json").write_text("{}")
    (root / "schemas").mkdir()
    (root / "schemas" / "match.json").write_text("{}")
    (root / "current.txt").write_text("v3_0_0")


def test_upload_plan_manifest_and_dry_run(tmp_path, capsys):
    _mk_tree(tmp_path)
    manifest = tmp_path / "out" / "manifest.json"
    rc = cli_main([
        "uploadData", "--local-data-dir", str(tmp_path),
        "--bucket", "test-bucket", "--data-version", "v9_9_9",
        "--with-config", "--with-schemas", "--with-version",
        "--manifest", str(manifest)])
    assert rc == 0
    plan = json.loads(manifest.read_text())
    assert plan["bucket"] == "test-bucket"
    entries = plan["entries"]
    dests = [e["dest"] for e in entries]
    # the script's full upload set (upload-data.sh:69-80 + config/
    # schemas/version helpers)
    assert "s3://test-bucket/v9_9_9/metadata/by_line" in dests
    assert "s3://test-bucket/v9_9_9/metadata/by_body" in dests
    assert dests.count("s3://test-bucket/v9_9_9/metadata/cdsresults") == 4
    assert dests.count("s3://test-bucket/v9_9_9/metadata/pppmresults") == 2
    assert "s3://test-bucket/v9_9_9/config.json" in dests
    assert "s3://test-bucket/v9_9_9/schemas" in dests
    assert "s3://test-bucket/current.txt" in dests
    assert "s3://test-bucket/next.txt" in dests
    by_line = next(e for e in entries if e["dest"].endswith("by_line"))
    assert by_line["exists"] and by_line["n_files"] == 2 \
        and by_line["recursive"]
    # dry-run prints the aws commands without executing anything
    out = capsys.readouterr().out
    assert "DRY-RUN: aws s3 cp" in out and "--recursive" in out


def test_upload_missing_sources_skipped(tmp_path):
    (tmp_path / "brain" / "cdmatches" / "em-vs-lm").mkdir(parents=True)
    manifest = tmp_path / "manifest.json"
    rc = cli_main([
        "uploadData", "--local-data-dir", str(tmp_path),
        "--manifest", str(manifest)])
    assert rc == 0
    entries = json.loads(manifest.read_text())["entries"]
    assert any(e["exists"] for e in entries)
    assert any(not e["exists"] for e in entries)


def test_upload_run_executes_command(tmp_path):
    """--run invokes the uploader per existing entry; a recording fake
    command stands in for aws."""
    _mk_tree(tmp_path)
    log = tmp_path / "calls.txt"
    fake = tmp_path / "fakeaws.py"
    fake.write_text(
        "import sys\n"
        f"open({str(log)!r}, 'a').write(' '.join(sys.argv[1:]) + '\\n')\n")
    rc = cli_main([
        "uploadData", "--local-data-dir", str(tmp_path),
        "--bucket", "b", "--run",
        "--upload-command", f"{sys.executable} {fake}"])
    assert rc == 0
    calls = log.read_text().splitlines()
    # 2 mips trees + 2 regions x (2 cds + 1 ppp) match tables
    assert len(calls) == 8
    assert all("--recursive" in c for c in calls)


def test_upload_bad_matches_spec(tmp_path):
    _mk_tree(tmp_path)
    with pytest.raises(SystemExit):
        cli_main(["uploadData", "--local-data-dir", str(tmp_path),
                  "--matches", "bogus"])
