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


def test_topk_cap_matches_trimmed_dense(tmp_path):
    """max_matches_per_mask (device top-k on the mesh, host trim off
    mesh) must keep exactly the k best matches per mask."""
    from colormipsearch_tpu.engine.cds import CDSParams, CDSearchEngine

    rng = np.random.default_rng(5)
    (tmp_path / "m").mkdir()
    (tmp_path / "t").mkdir()
    masks = _neurons(tmp_path / "m", rng, 2)
    targets = _neurons(tmp_path / "t", rng, 16)

    params = CDSParams(mask_threshold=20, data_threshold=20,
                       pix_color_fluctuation=2.0, xy_shift=2,
                       mirror_mask=True)
    k = 3

    for engine in (CDSearchEngine(params),               # mesh top-k
                   CDSearchEngine(params, use_mesh=False)):  # host trim
        dense = engine.find_all_matches(masks, targets)
        capped = engine.find_all_matches(masks, targets,
                                         max_matches_per_mask=k)
        by_mask = {}
        for m in dense:
            by_mask.setdefault(m.mask_image.mip_id, []).append(m)
        expected = set()
        for mip, ms in by_mask.items():
            ms.sort(key=lambda m: -m.matching_pixels)
            cut = ms[:k]
            # scores at the k-boundary may tie; compare score multisets
            expected |= {(mip, m.matching_pixels) for m in cut}
        got = {(m.mask_image.mip_id, m.matching_pixels) for m in capped}
        assert got == expected
        for mip in by_mask:
            assert sum(m.mask_image.mip_id == mip for m in capped) \
                == min(k, len(by_mask[mip]))


def test_streaming_iter_equals_batch(tmp_path):
    """find_all_matches_iter chunks concatenate to the full match set."""
    from colormipsearch_tpu.engine.cds import CDSParams, CDSearchEngine

    rng = np.random.default_rng(7)
    (tmp_path / "m").mkdir()
    (tmp_path / "t").mkdir()
    masks = _neurons(tmp_path / "m", rng, 2)
    targets = _neurons(tmp_path / "t", rng, 9)
    params = CDSParams(mask_threshold=20, data_threshold=20,
                       pix_color_fluctuation=2.0, xy_shift=0)
    engine = CDSearchEngine(params, use_mesh=False)

    streamed = []
    for chunk in engine.find_all_matches_iter(masks, targets):
        streamed.extend(chunk)
    full = engine.find_all_matches(masks, targets)

    def key(ms):
        return sorted((m.mask_image.mip_id, m.matched_image.mip_id,
                       m.matching_pixels) for m in ms)

    assert key(streamed) == key(full) and full


def test_cli_streaming_flushes_match_one_shot(tmp_path):
    """colorDepthSearch with --write-batch-size 1 (many merge-append
    flushes across target tiles) produces the same grouped files as a
    single write."""
    import json
    from colormipsearch_tpu.cli.main import main
    from colormipsearch_tpu.dataio.json_io import write_neurons_json

    rng = np.random.default_rng(11)
    (tmp_path / "m").mkdir()
    (tmp_path / "t").mkdir()
    masks = _neurons(tmp_path / "m", rng, 2)
    targets = _neurons(tmp_path / "t", rng, 8)
    write_neurons_json(masks, tmp_path / "masks.json")
    write_neurons_json(targets, tmp_path / "targets.json")

    def run(out, batch):
        assert main([
            "colorDepthSearch", "-m", str(tmp_path / "masks.json"),
            "-i", str(tmp_path / "targets.json"),
            "--maskThreshold", "20", "--dataThreshold", "20",
            "--pixColorFluctuation", "2.0", "--xyShift", "2",
            "--mirrorMask", "-od", str(out), "--perMaskSubdir", "masks",
            # the default text-label regions would cover the whole
            # 40x64 synthetic image (x<330, y<100)
            "--no-name-labels", "--no-colormap-labels",
            "--write-batch-size", str(batch)]) == 0
        got = {}
        for f in sorted((out / "masks").glob("*.json")):
            doc = json.loads(f.read_text())
            got[f.name] = sorted(
                (r["image"]["mipId"], r["matchingPixels"], r["mirrored"])
                for r in doc["results"])
        return got

    streamed = run(tmp_path / "out_stream", 1)
    oneshot = run(tmp_path / "out_oneshot", 10 ** 9)
    assert streamed == oneshot and streamed


def test_split_planes_engine_equality(tmp_path, monkeypatch):
    """CDS_SPLIT_PLANES: the 3-byte split-plane kernel path produces the
    same matches as the packed path, on the mesh and single-device."""
    from colormipsearch_tpu.engine import cds as cds_mod
    from colormipsearch_tpu.engine.cds import CDSParams, CDSearchEngine

    rng = np.random.default_rng(11)
    (tmp_path / "m").mkdir()
    (tmp_path / "t").mkdir()
    masks = _neurons(tmp_path / "m", rng, 2)
    targets = _neurons(tmp_path / "t", rng, 9)
    params = CDSParams(mask_threshold=20, data_threshold=20,
                       pix_color_fluctuation=2.0, xy_shift=2,
                       mirror_mask=True)

    def key(ms):
        return sorted((m.mask_image.mip_id, m.matched_image.mip_id,
                       m.matching_pixels, m.mirrored) for m in ms)

    baseline = key(CDSearchEngine(params).find_all_matches(masks, targets))
    assert baseline, "expected some matches"
    monkeypatch.setattr(cds_mod, "_USE_SPLIT", True)
    assert key(CDSearchEngine(params).find_all_matches(
        masks, targets)) == baseline
    assert key(CDSearchEngine(params, use_mesh=False).find_all_matches(
        masks, targets)) == baseline


def test_flagged_zero_score_pair_reaches_oracle(tmp_path):
    """A pair whose only potential match sits in the ambiguity band can
    have fast score 0 with flags > 0; the engine must still run the
    float64 oracle on it (bit-identity contract) instead of dropping it
    at the best>0 candidate filter.  rgb(50,0,53) vs rgb(151,0,158) at
    pixColorFluctuation 1.23 (banded f32 same-class branch): f32 ratio
    gap lands just above fl32(ztol) inside the band, but the Java f64
    gap is <= ztol, so the reference scores 1."""
    import jax.numpy as jnp
    from PIL import Image

    from colormipsearch_tpu.engine.cds import CDSearchEngine, CDSParams
    from colormipsearch_tpu.model import ComputeFileType, Neuron
    from colormipsearch_tpu.ops import common, pixel_match
    from colormipsearch_tpu.oracle.pixel import PixelMatchOracle

    mask = np.zeros((8, 8, 3), np.uint8)
    target = np.zeros((8, 8, 3), np.uint8)
    mask[0, 0] = (50, 0, 53)      # BR class, ratio 50/53
    target[0, 0] = (151, 0, 158)  # BR class, ratio 151/158

    # kernel level: fast score 0, flagged
    plan = pixel_match.build_query_plan(
        mask, 0, mirror=False, xy_shift=0, pix_color_fluctuation=1.23)
    planes = common.pack_target_planes(jnp.asarray(target[None]))
    scores, flags = pixel_match.score_query_against_planes(
        planes, jnp.asarray(plan.positions), jnp.asarray(plan.q_cls),
        jnp.asarray(plan.q_s), jnp.asarray(plan.q_p),
        target_threshold=0, ztol_num=plan.ztol_num,
        ztol_den=plan.ztol_den)
    assert int(np.asarray(scores).max()) == 0
    assert int(np.asarray(flags).sum()) > 0
    # the reference (float64 oracle) says MATCH
    oracle = PixelMatchOracle(mask, 0, mirror=False, target_threshold=0,
                              z_tolerance=1.23 / 100, xy_shift=0)
    assert oracle.score(target).matching_pixels == 1

    # engine end-to-end: the match must be emitted with the oracle score
    Image.fromarray(mask).save(tmp_path / "m.png")
    Image.fromarray(target).save(tmp_path / "t.png")
    mn = Neuron(mip_id="m")
    mn.set_compute_file(ComputeFileType.InputColorDepthImage,
                        str(tmp_path / "m.png"))
    tn = Neuron(mip_id="t")
    tn.set_compute_file(ComputeFileType.InputColorDepthImage,
                        str(tmp_path / "t.png"))
    engine = CDSearchEngine(CDSParams(
        mask_threshold=0, data_threshold=0, pix_color_fluctuation=1.23,
        xy_shift=0, mirror_mask=False))
    out = engine.find_all_matches([mn], [tn])
    assert len(out) == 1
    assert out[0].matching_pixels == 1
