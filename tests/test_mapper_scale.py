"""Lite incremental mapper beyond toy scale: a 24-image ring with unknown
intrinsics (focal sweeps + Bougnoux seeding + escalating-threshold PnP
retries all exercised) must register every image and recover the geometry
up to gauge (checked through relative poses and reprojection error)."""

import numpy as np
import PIL.Image
import pytest

pytestmark = pytest.mark.heavy  # run via tools/run_suite.sh heavy lane

from pixsfm_tpu.base.graph import Graph
from pixsfm_tpu.sfm.mapper import incremental_mapping


def _quat_to_R(q):
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


@pytest.fixture(scope="module")
def ring_scene(tmp_path_factory):
    """24 cameras on a ring, 500 points, SIMPLE_RADIAL f=1000 k=0.02,
    0.3 px keypoint noise; exhaustive pairwise matches."""
    rng = np.random.default_rng(42)
    I, Np = 24, 500
    W, H = 1024, 768
    f_true, k_true = 1000.0, 0.02
    xyz = rng.uniform(-1, 1, (Np, 3))
    xyz[:, 2] *= 0.6

    Rs, ts = [], []
    for a in np.linspace(0, 2 * np.pi, I, endpoint=False):
        c = np.array([3.5 * np.cos(a), 0.5 * np.sin(2 * a), 3.5 * np.sin(a)])
        zax = -c / np.linalg.norm(c)
        xax = np.cross([0, 1.0, 0], zax)
        xax /= np.linalg.norm(xax)
        yax = np.cross(zax, xax)
        R = np.stack([xax, yax, zax])
        Rs.append(R)
        ts.append(-R @ c)

    image_dir = tmp_path_factory.mktemp("ring_images")
    names = [f"im{i:02d}.png" for i in range(I)]
    blank = PIL.Image.new("RGB", (W, H))
    for n in names:
        blank.save(image_dir / n)

    keypoints = {}
    kp_of = {}          # name -> {pid: kp_idx}
    for i, n in enumerate(names):
        xc = xyz @ Rs[i].T + ts[i]
        z = xc[:, 2]
        uv = xc[:, :2] / z[:, None]
        r2 = (uv ** 2).sum(1)
        d = uv * (1 + k_true * r2)[:, None]
        xy = f_true * d + np.array([W / 2, H / 2])
        vis = (z > 0.5) & (xy[:, 0] > 10) & (xy[:, 0] < W - 10) \
            & (xy[:, 1] > 10) & (xy[:, 1] < H - 10)
        idxs = np.nonzero(vis)[0]
        kps = xy[idxs] + rng.normal(0, 0.3, (len(idxs), 2))
        keypoints[n] = kps
        kp_of[n] = {int(pid): j for j, pid in enumerate(idxs)}

    graph = Graph()
    for a in range(I):
        for b in range(a + 1, I):
            na, nb = names[a], names[b]
            shared = sorted(set(kp_of[na]) & set(kp_of[nb]))
            if len(shared) < 30:
                continue
            m = np.asarray([[kp_of[na][p], kp_of[nb][p]] for p in shared])
            graph.register_matches(na, nb, m, np.ones(len(m)))

    return dict(image_dir=image_dir, names=names, keypoints=keypoints,
                Rs=Rs, ts=ts, f_true=f_true, xyz=xyz, graph=graph)


@pytest.fixture(scope="module")
def ring_scene60(tmp_path_factory):
    """60 cameras on a double-height ring, 1200 points, SIMPLE_RADIAL
    f=1200 k=-0.04, 0.4 px keypoint noise, 15% clutter keypoints per
    image, covisibility-limited matching (ring distance <= 8) and ~12%
    OUTLIER matches per pair (random wrong correspondences with the same
    scores as inliers). This is the realistic-scale robustness scene the
    reference gets for free from COLMAP (reference refine_hloc.py
    delegates mapping to pycolmap); the lite mapper must survive
    registration ordering, RANSAC filtering, retriangulation, and robust
    BA with contaminated tracks."""
    rng = np.random.default_rng(7)
    I, Np = 60, 1200
    W, H = 1280, 960
    f_true, k_true = 1200.0, -0.04
    xyz = rng.uniform(-1, 1, (Np, 3))
    xyz[:, 2] *= 0.6
    xyz[:, 1] *= 0.8

    Rs, ts = [], []
    for i, a in enumerate(np.linspace(0, 2 * np.pi, I, endpoint=False)):
        c = np.array([3.8 * np.cos(a),
                      0.9 * np.sin(3 * a) + (0.6 if i % 2 else -0.6),
                      3.8 * np.sin(a)])
        zax = -c / np.linalg.norm(c)
        xax = np.cross([0, 1.0, 0], zax)
        xax /= np.linalg.norm(xax)
        yax = np.cross(zax, xax)
        R = np.stack([xax, yax, zax])
        Rs.append(R)
        ts.append(-R @ c)

    image_dir = tmp_path_factory.mktemp("ring60_images")
    names = [f"im{i:02d}.png" for i in range(I)]
    blank = PIL.Image.new("RGB", (W, H))
    for n in names:
        blank.save(image_dir / n)

    keypoints = {}
    kp_of = {}          # name -> {pid: kp_idx}
    for i, n in enumerate(names):
        xc = xyz @ Rs[i].T + ts[i]
        z = xc[:, 2]
        uv = xc[:, :2] / z[:, None]
        r2 = (uv ** 2).sum(1)
        d = uv * (1 + k_true * r2)[:, None]
        xy = f_true * d + np.array([W / 2, H / 2])
        vis = (z > 0.5) & (xy[:, 0] > 10) & (xy[:, 0] < W - 10) \
            & (xy[:, 1] > 10) & (xy[:, 1] < H - 10)
        idxs = np.nonzero(vis)[0]
        kps = xy[idxs] + rng.normal(0, 0.4, (len(idxs), 2))
        # clutter keypoints: detections with no 3D counterpart — outlier
        # matches land on these (and on valid keypoints of other points)
        n_clutter = int(0.15 * len(idxs))
        clutter = np.column_stack([rng.uniform(10, W - 10, n_clutter),
                                   rng.uniform(10, H - 10, n_clutter)])
        keypoints[n] = np.vstack([kps, clutter])
        kp_of[n] = {int(pid): j for j, pid in enumerate(idxs)}

    graph = Graph()
    n_pairs = n_out_total = 0
    for a in range(I):
        for db in range(1, 9):       # covisibility window on the ring
            b = (a + db) % I
            na, nb = names[a], names[b]
            shared = sorted(set(kp_of[na]) & set(kp_of[nb]))
            if len(shared) < 30:
                continue
            m = np.asarray([[kp_of[na][p], kp_of[nb][p]] for p in shared])
            # contaminate: ~12% random wrong matches, same score as inliers
            n_out = max(4, int(0.12 * len(m)))
            bad = np.column_stack([
                rng.integers(0, len(keypoints[na]), n_out),
                rng.integers(0, len(keypoints[nb]), n_out)])
            used_a, used_b = set(m[:, 0]), set(m[:, 1])
            bad = bad[[r[0] not in used_a and r[1] not in used_b
                       for r in bad]]
            m_all = np.vstack([m, bad])
            perm = rng.permutation(len(m_all))
            graph.register_matches(na, nb, m_all[perm],
                                   np.ones(len(m_all)))
            n_pairs += 1
            n_out_total += len(bad)

    return dict(image_dir=image_dir, names=names, keypoints=keypoints,
                Rs=Rs, ts=ts, f_true=f_true, xyz=xyz, graph=graph,
                n_pairs=n_pairs, n_outliers=n_out_total)


def test_mapper_ring60_outliers(ring_scene60):
    """Pose/point envelope at 60 images with contaminated matches:
    >=95% registered, consecutive relative rotations within 0.6 deg mean,
    shared focal within 5%, mean reprojection error < 1.2 px."""
    sc = ring_scene60
    assert sc["n_outliers"] > 1000, "fixture must inject real contamination"
    assert sc["n_pairs"] >= 60, "covisibility window must yield a ring of pairs"
    rec = incremental_mapping(sc["graph"], sc["keypoints"], sc["image_dir"],
                              camera_model="SIMPLE_RADIAL",
                              shared_camera=True, ba_every=6, n_restarts=1)
    names = sc["names"]
    reg = [im for im in rec.images.values() if im.registered]
    assert len(reg) >= int(0.95 * len(names)), \
        f"only {len(reg)}/{len(names)} images registered"

    cam = next(iter(rec.cameras.values()))
    assert abs(cam.params[0] - sc["f_true"]) / sc["f_true"] < 0.05, cam.params

    name_to_gt = {n: i for i, n in enumerate(names)}
    regs = sorted(reg, key=lambda im: im.name)
    errs = []
    for im1, im2 in zip(regs[:-1], regs[1:]):
        Ra = _quat_to_R(im1.qvec)
        Rb = _quat_to_R(im2.qvec)
        R_est = Rb @ Ra.T
        ga = sc["Rs"][name_to_gt[im1.name]]
        gb = sc["Rs"][name_to_gt[im2.name]]
        R_gt = gb @ ga.T
        c = np.clip((np.trace(R_est @ R_gt.T) - 1) / 2, -1, 1)
        errs.append(np.degrees(np.arccos(c)))
    assert np.mean(errs) < 0.6, (np.mean(errs), np.max(errs))
    assert np.max(errs) < 3.0, (np.mean(errs), np.max(errs))

    # contaminated tracks must have been filtered, not averaged in
    assert rec.mean_reprojection_error() < 1.2


def test_mapper_ring24(ring_scene):
    rec = incremental_mapping(ring_scene["graph"],
                              ring_scene["keypoints"],
                              ring_scene["image_dir"],
                              camera_model="SIMPLE_RADIAL",
                              shared_camera=True, ba_every=4)
    names = ring_scene["names"]
    reg = [im for im in rec.images.values() if im.registered]
    assert len(reg) >= len(names) - 1, \
        f"only {len(reg)}/{len(names)} images registered"

    # focal recovered (shared camera, unknown intrinsics)
    cam = next(iter(rec.cameras.values()))
    assert abs(cam.params[0] - ring_scene["f_true"]) / \
        ring_scene["f_true"] < 0.05, cam.params

    # relative rotations vs ground truth (gauge-invariant)
    name_to_gt = {n: i for i, n in enumerate(names)}
    regs = sorted(reg, key=lambda im: im.name)
    errs = []
    for im1, im2 in zip(regs[:-1], regs[1:]):
        Ra = _quat_to_R(im1.qvec)
        Rb = _quat_to_R(im2.qvec)
        R_est = Rb @ Ra.T
        ga = ring_scene["Rs"][name_to_gt[im1.name]]
        gb = ring_scene["Rs"][name_to_gt[im2.name]]
        R_gt = gb @ ga.T
        c = np.clip((np.trace(R_est @ R_gt.T) - 1) / 2, -1, 1)
        errs.append(np.degrees(np.arccos(c)))
    assert np.mean(errs) < 0.5, (np.mean(errs), np.max(errs))

    # reprojection quality of the recovered structure
    assert rec.mean_reprojection_error() < 1.0
