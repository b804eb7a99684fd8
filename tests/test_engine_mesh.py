"""The engine auto-shards over the mesh and matches single-device."""

import numpy as np

import jax


def _neurons(tmp_path, rng, count, h=40, w=64):
    from PIL import Image
    from colormipsearch_tpu.model import ComputeFileType, LMNeuron

    out = []
    for i in range(count):
        img = np.zeros((h, w, 3), np.uint8)
        n = 300
        img[rng.integers(0, h, n), rng.integers(0, w, n)] = \
            rng.integers(0, 256, (n, 3))
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(img).save(p)
        neuron = LMNeuron(mip_id=f"img_{i}", published_name=f"img_{i}")
        neuron.set_compute_file(ComputeFileType.InputColorDepthImage, str(p))
        out.append(neuron)
    return out


def test_mesh_engine_matches_single_device(tmp_path):
    from colormipsearch_tpu.engine.cds import CDSParams, CDSearchEngine

    assert len(jax.devices()) == 8
    rng = np.random.default_rng(3)
    (tmp_path / "m").mkdir()
    (tmp_path / "t").mkdir()
    masks = _neurons(tmp_path / "m", rng, 3)
    targets = _neurons(tmp_path / "t", rng, 10)

    params = CDSParams(mask_threshold=20, data_threshold=20,
                       pix_color_fluctuation=2.0, xy_shift=2,
                       mirror_mask=True)

    meshed = CDSearchEngine(params)  # auto-detects the 8-device mesh
    assert meshed._mesh is not None
    single = CDSearchEngine(params, use_mesh=False)
    assert single._mesh is None

    def key(ms):
        return sorted((m.mask_image.mip_id, m.matched_image.mip_id,
                       m.matching_pixels, m.mirrored) for m in ms)

    res_mesh = meshed.find_all_matches(masks, targets)
    res_single = single.find_all_matches(masks, targets)
    assert key(res_mesh) == key(res_single)
    assert res_mesh, "expected some matches"
