"""Bounded image cache (io/cache.py, CachedMIPsUtils analogue)."""

import numpy as np


def _neuron(tmp_path, name):
    from PIL import Image
    from colormipsearch_tpu.model import ComputeFileType, EMNeuron

    img = np.zeros((8, 10, 3), np.uint8)
    img[2, 3] = (100, 50, 25)
    p = tmp_path / f"{name}.png"
    Image.fromarray(img).save(p)
    n = EMNeuron(mip_id=name, published_name=name)
    n.set_compute_file(ComputeFileType.InputColorDepthImage, str(p))
    return n


def test_cache_hits_and_eviction(tmp_path):
    from colormipsearch_tpu.io import cache
    from colormipsearch_tpu.model import ComputeFileType

    ft = ComputeFileType.InputColorDepthImage
    ns = [_neuron(tmp_path, f"n{i}") for i in range(3)]

    cache.initialize_cache(2)
    for n in ns[:2]:
        assert cache.load_mip(n, ft).has_image
    stats = cache.cache_stats()
    assert stats == {"size": 2, "capacity": 2, "hits": 0, "misses": 2}

    # repeat loads hit
    assert cache.load_mip(ns[0], ft).has_image
    assert cache.cache_stats()["hits"] == 1
    # third distinct image evicts the LRU entry (n1, since n0 was
    # refreshed by the hit)
    cache.load_mip(ns[2], ft)
    cache.load_mip(ns[0], ft)
    s = cache.cache_stats()
    assert s["size"] == 2 and s["hits"] == 2

    # capacity 0 disables caching entirely
    cache.initialize_cache(0)
    assert cache.load_mip(ns[0], ft).has_image
    assert cache.cache_stats()["size"] == 0

    # missing compute file degrades to an empty MIP (CachedMIPsUtils
    # empty-on-failure semantics)
    from colormipsearch_tpu.model import EMNeuron

    cache.initialize_cache(2)
    empty = cache.load_mip(EMNeuron(mip_id="none"), ft)
    assert not empty.has_image
