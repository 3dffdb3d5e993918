"""util.prefetch: ordered async prefetching used by extraction + KA chunking."""

import threading
import time

import numpy as np
import pytest

from pixsfm_tpu.util.prefetch import prefetch_map


def test_order_preserved():
    items = list(range(50))
    out = list(prefetch_map(lambda x: x * x, items, depth=4))
    assert out == [x * x for x in items]


def test_depth_zero_passthrough():
    calls = []

    def fn(x):
        calls.append(x)
        return x

    out = list(prefetch_map(fn, [1, 2, 3], depth=0))
    assert out == [1, 2, 3] and calls == [1, 2, 3]


def test_exception_propagates_in_position():
    def fn(x):
        if x == 3:
            raise ValueError("boom")
        return x

    got = []
    with pytest.raises(ValueError, match="boom"):
        for v in prefetch_map(fn, range(6), depth=2):
            got.append(v)
    assert got == [0, 1, 2]


def test_producer_runs_ahead():
    """With depth=2 the producer computes ahead while the consumer sleeps."""
    produced = []
    lock = threading.Lock()

    def fn(x):
        with lock:
            produced.append(x)
        return x

    it = prefetch_map(fn, range(5), depth=2)
    first = next(it)
    assert first == 0
    deadline = time.time() + 5.0
    while time.time() < deadline:
        with lock:
            if len(produced) >= 3:   # 0 consumed + 2 queued ahead
                break
        time.sleep(0.01)
    with lock:
        assert len(produced) >= 3
    assert list(it) == [1, 2, 3, 4]


def test_early_consumer_exit_stops_producer():
    n_called = [0]

    def fn(x):
        n_called[0] += 1
        time.sleep(0.01)
        return x

    it = prefetch_map(fn, range(100), depth=1)
    assert next(it) == 0
    it.close()   # generator finalizer must join the producer
    time.sleep(0.1)
    assert n_called[0] < 100


def test_extraction_prefetch_matches_serial(tmp_path):
    """features_from_image_list with prefetch on/off produces identical maps."""
    import PIL.Image

    from pixsfm_tpu.extract import features_from_image_list
    from pixsfm_tpu.features.extractor import FeatureExtractor

    rng = np.random.default_rng(0)
    names = [f"im{i}.png" for i in range(3)]
    for n in names:
        PIL.Image.fromarray(
            rng.integers(0, 255, (40, 52, 3), dtype=np.uint8)).save(
                tmp_path / n)
    kps = {n: rng.uniform(10, 30, (5, 2)) for n in names}

    outs = []
    for depth, batch in ((0, 1), (2, 1), (2, 4)):
        conf = {"model": {"name": "image"}, "patch_size": 8, "sparse": True,
                "l2_normalize": False, "dtype": "float32",
                "prefetch_depth": depth, "batch_size": batch}
        mgr = features_from_image_list(FeatureExtractor(conf), names,
                                       tmp_path, keypoints_per_image=kps)
        outs.append({n: mgr.fset(0).get_map(n).get_patch(0).data
                     for n in names})
    for n in names:
        np.testing.assert_array_equal(outs[0][n], outs[1][n])
        # batched CNN forward == per-image forward
        np.testing.assert_allclose(outs[0][n], outs[2][n],
                                   rtol=1e-6, atol=1e-6)


def test_batched_extraction_mixed_sizes(tmp_path):
    """Shape changes inside the stream split the batch groups correctly."""
    import PIL.Image

    from pixsfm_tpu.extract import features_from_image_list
    from pixsfm_tpu.features.extractor import FeatureExtractor

    rng = np.random.default_rng(1)
    sizes = [(40, 52), (40, 52), (30, 44), (40, 52)]
    names = [f"m{i}.png" for i in range(len(sizes))]
    for n, (h, w) in zip(names, sizes):
        PIL.Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
                tmp_path / n)
    kps = {n: rng.uniform(8, 20, (4, 2)) for n in names}

    ref, batched = [
        features_from_image_list(
            FeatureExtractor({"model": {"name": "image"}, "patch_size": 8,
                              "sparse": True, "l2_normalize": False,
                              "dtype": "float32", "batch_size": bs}),
            names, tmp_path, keypoints_per_image=kps)
        for bs in (1, 8)]
    for n in names:
        np.testing.assert_allclose(
            ref.fset(0).get_map(n).get_patch(0).data,
            batched.fset(0).get_map(n).get_patch(0).data,
            rtol=1e-6, atol=1e-6)
