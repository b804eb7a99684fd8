"""Filename parsing + segmented-image matching tests."""

import numpy as np
from PIL import Image

from colormipsearch_tpu.io.naming import (
    extract_color_channel,
    extract_em_body_id,
    extract_em_neuron_state,
    extract_objective,
    index_segmented_images,
    is_em_library,
    lookup_searchable_images,
)
from colormipsearch_tpu.model import ComputeFileType, EMNeuron, LMNeuron


def test_channel_extraction():
    assert extract_color_channel("VT056372-xx-f_CL3_ch2_001.tif") == 1
    assert extract_color_channel("R10A07-aaa-40x-CH3-02.png") == 2
    assert extract_color_channel("sample-c1.tif") == 0
    assert extract_color_channel("no_channel_here.tif") == -1
    # channel base 0
    assert extract_color_channel("x_ch2_.tif", channel_base=0) == 2


def test_objective_and_body():
    assert extract_objective("R10A07-20190813_66-40x-brain.png") == "40x"
    assert extract_objective("noobj.png") is None
    assert extract_em_body_id("1752016801-LPLC2-RT_18U.tif") == "1752016801"
    assert extract_em_body_id("noid.tif") is None
    assert extract_em_neuron_state("123456-LV_18U") == "LV"


def test_is_em_library():
    assert is_em_library("flyem_hemibrain_1_2_1")
    assert is_em_library("FlyWire_FAFB")
    assert not is_em_library("FlyLight Gen1 MCFO")
    assert not is_em_library(None)


def _save(p, name):
    img = np.zeros((4, 4, 3), np.uint8)
    Image.fromarray(img).save(p / name)


def test_lookup_lm_by_channel_and_objective(tmp_path):
    seg = tmp_path / "seg"
    seg.mkdir()
    _save(seg, "sc1-stuff_40x_ch2_01.tif")
    _save(seg, "sc1-stuff_40x_ch1_01.tif")
    _save(seg, "sc1-stuff_20x_ch2_01.tif")
    _save(seg, "other-stuff_40x_ch2_01.tif")
    idx = index_segmented_images([str(seg)])

    n = LMNeuron(mip_id="m", slide_code="sc1", library_name="MCFO",
                 channel=2, objective="40x")
    found = lookup_searchable_images(n, idx)
    names = sorted(f.name.rsplit("/", 1)[-1] for f in found)
    assert names == ["sc1-stuff_40x_ch2_01.tif"]


def test_lookup_em_with_state(tmp_path):
    seg = tmp_path / "seg"
    seg.mkdir()
    _save(seg, "12345-LV_18U_FL.tif")
    _save(seg, "12345-TC_18U_FL.tif")
    idx = index_segmented_images([str(seg)])

    n = EMNeuron(mip_id="m", published_name="12345",
                 library_name="flyem_hemibrain")
    n.set_compute_file(ComputeFileType.SourceColorDepthImage,
                       "/store/12345-L_18U.tif")
    found = lookup_searchable_images(n, idx, match_neuron_state=True)
    names = [f.name.rsplit("/", 1)[-1] for f in found]
    assert names == ["12345-LV_18U_FL.tif"]
    # without state matching both images qualify
    assert len(lookup_searchable_images(n, idx)) == 2
