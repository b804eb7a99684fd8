"""JACS ingest client tests (offline file:// transport)."""

import json

import pytest


def run_cli(*argv):
    from colormipsearch_tpu.cli.main import main
    assert main([str(a) for a in argv]) == 0


@pytest.fixture()
def jacs_dump(tmp_path):
    """Two pages of /data/colorDepthMIPsWithSamples dumps."""
    page0 = [
        {"id": f"mip{i}", "alignmentSpace": "JRC2018_Unisex_20x_HR",
         "filepath": f"/store/cdm/img{i}.png",
         "sampleRef": f"Sample#{i}",
         "objective": "40x", "anatomicalArea": "Brain",
         "channelNumber": "2",
         "sample": {"publishingName": f"R{i:02d}A01",
                    "slideCode": f"2020_{i}", "gender": "f",
                    "line": f"line{i}"}}
        for i in range(3)
    ]
    d = tmp_path / "dump"
    d.mkdir()
    (d / "data_colorDepthMIPsWithSamples_0.json").write_text(
        json.dumps(page0))
    return d


def test_jacs_client_paging(jacs_dump):
    from colormipsearch_tpu.io.jacs import JacsClient

    client = JacsClient(f"file://{jacs_dump}")
    recs = list(client.color_depth_mips_with_samples(
        library="FlyLight Gen1 MCFO"))
    assert len(recs) == 3


def test_jacs_em_vs_lm_mapping():
    from colormipsearch_tpu.io.jacs import mip_record_to_neuron
    from colormipsearch_tpu.model import EMNeuron, LMNeuron

    em = mip_record_to_neuron(
        {"id": "x", "filepath": "/f.png", "bodyId": 12345,
         "alignmentSpace": "AS",
         "emBody": {"neuronType": "PFL1"}},
        "flyem_hemibrain_1_2_1")
    assert isinstance(em, EMNeuron)
    assert em.published_name == "12345"
    assert em.neuron_type == "PFL1"

    lm = mip_record_to_neuron(
        {"id": "y", "filepath": "/g.png",
         "sample": {"publishingName": "R10A07", "slideCode": "sc",
                    "gender": "m"}},
        "FlyLight Gen1 MCFO")
    assert isinstance(lm, LMNeuron)
    assert lm.published_name == "R10A07"
    assert lm.gender == "m"


def test_create_data_input_from_jacs_cli(tmp_path, jacs_dump):
    run_cli("createColorDepthSearchDataInput",
            "--jacs-url", f"file://{jacs_dump}",
            "-l", "FlyLight Gen1 MCFO",
            "--alignment-space", "JRC2018_Unisex_20x_HR",
            "-od", tmp_path, "--output-filename", "jacs.json")
    data = json.loads((tmp_path / "jacs.json").read_text())
    assert len(data) == 3
    assert data[0]["class"].endswith("LMNeuronEntity")
    assert data[0]["slideCode"] == "2020_0"
    assert data[0]["channel"] == 2
    assert "SourceColorDepthImage" in data[0]["computeFiles"]
