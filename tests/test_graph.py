import numpy as np

from pixsfm_tpu.base.graph import (
    Graph, compute_root_labels, compute_score_labels, compute_track_labels,
    count_track_edges,
)


def simple_graph():
    g = Graph()
    # images A, B, C; two tracks: (A0,B0,C0) and (A1,B1)
    g.register_matches("A", "B", np.array([[0, 0], [1, 1]]),
                       np.array([0.9, 0.8]))
    g.register_matches("B", "C", np.array([[0, 0]]), np.array([0.7]))
    g.register_matches("A", "C", np.array([[0, 0]]), np.array([0.6]))
    return g


def test_track_labels():
    g = simple_graph()
    labels = compute_track_labels(g)
    assert g.num_nodes == 5
    nid = g._node_map
    a0 = nid[(g.image_name_to_id["A"], 0)]
    b0 = nid[(g.image_name_to_id["B"], 0)]
    c0 = nid[(g.image_name_to_id["C"], 0)]
    a1 = nid[(g.image_name_to_id["A"], 1)]
    b1 = nid[(g.image_name_to_id["B"], 1)]
    assert labels[a0] == labels[b0] == labels[c0]
    assert labels[a1] == labels[b1]
    assert labels[a0] != labels[a1]


def test_same_image_constraint():
    g = Graph()
    # A0-B0 and A1-B0 would put A0,A1 in the same track: second merge must fail
    g.register_matches("A", "B", np.array([[0, 0], [1, 0]]),
                       np.array([0.9, 0.8]))
    labels = compute_track_labels(g)
    nid = g._node_map
    a0 = nid[(g.image_name_to_id["A"], 0)]
    a1 = nid[(g.image_name_to_id["A"], 1)]
    b0 = nid[(g.image_name_to_id["B"], 0)]
    assert labels[a0] == labels[b0]
    assert labels[a1] != labels[a0]


def test_scores_and_roots():
    g = simple_graph()
    labels = compute_track_labels(g)
    scores = compute_score_labels(g, labels)
    roots = compute_root_labels(g, labels, scores)
    # exactly one root per track
    n_tracks = labels.max() + 1
    assert roots.sum() == n_tracks
    for t in range(n_tracks):
        in_track = np.where(labels == t)[0]
        root = in_track[roots[in_track]]
        assert len(root) == 1
        assert scores[root[0]] == scores[in_track].max()


def test_count_track_edges():
    g = simple_graph()
    labels = compute_track_labels(g)
    counts = count_track_edges(g, labels)
    assert counts.sum() == 4  # all 4 edges are intra-track
