"""Native C++ graph core vs numpy reference parity."""

import numpy as np
import pytest

from pixsfm_tpu import native
from pixsfm_tpu.base import graph as G

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libgraph_core.so not built")


def random_graph(n_images=8, kps_per_image=40, n_edges=600, seed=0):
    rng = np.random.default_rng(seed)
    g = G.Graph()
    names = [f"im{i}" for i in range(n_images)]
    for _ in range(n_edges):
        i, j = rng.choice(n_images, 2, replace=False)
        k1 = int(rng.integers(kps_per_image))
        k2 = int(rng.integers(kps_per_image))
        g.register_matches(names[i], names[j], np.array([[k1, k2]]),
                           np.array([rng.uniform(0.1, 1.0)]))
    return g


def _numpy_track_labels(g):
    """Force the numpy path by monkeypatching availability off."""
    avail = native.available
    native.available = lambda: False
    try:
        return G.compute_track_labels(g)
    finally:
        native.available = avail


def test_track_labels_parity():
    g = random_graph()
    ref = _numpy_track_labels(g)
    ids, _ = g.nodes_array()
    src, dst, sim = g.edges_array()
    nat = native.compute_track_labels_native(src, dst, sim, ids)
    np.testing.assert_array_equal(nat, ref)


def test_scores_roots_parity():
    g = random_graph(seed=2)
    tl = _numpy_track_labels(g)
    avail = native.available
    native.available = lambda: False
    try:
        scores_ref = G.compute_score_labels(g, tl)
        roots_ref = G.compute_root_labels(g, tl, scores_ref)
    finally:
        native.available = avail
    src, dst, sim = g.edges_array()
    scores_nat = native.compute_score_labels_native(g.num_nodes, src, dst,
                                                    sim, tl)
    np.testing.assert_allclose(scores_nat, scores_ref)
    roots_nat = native.compute_root_labels_native(tl, scores_nat)
    np.testing.assert_array_equal(roots_nat, roots_ref)


def test_ffd_parity_invariants():
    rng = np.random.default_rng(3)
    counts = rng.integers(1, 30, 500)
    t2p, n_bins = native.ffd_bin_packing_native(counts, 50)
    bins = np.zeros(n_bins, np.int64)
    np.add.at(bins, t2p, counts)
    assert (bins[bins <= 50].size >= n_bins - (counts > 50).sum())
    # every track assigned
    assert (t2p >= 0).all() and (t2p < n_bins).all()
