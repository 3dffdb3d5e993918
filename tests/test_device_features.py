"""Device-resident feature pipeline: DeviceFeatureMap + on-device FeatureView
packing must match the host (numpy) path exactly, with the packed patch array
staying a device array end to end (extraction -> packing -> solver)."""

import numpy as np
import jax
import jax.numpy as jnp
import PIL.Image
import pytest

from pixsfm_tpu.features.extractor import FeatureExtractor
from pixsfm_tpu.features.featuremaps import (DeviceFeatureMap, FeatureMap,
                                             FeatureSet, FeatureView,
                                             kDensePatchId)

from test_keypoint_adjustment import make_scene, _Manager


def _save_image(tmp_path, seed=0, shape=(60, 80, 3)):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, shape).astype(np.uint8)
    path = tmp_path / f"img{seed}.png"
    PIL.Image.fromarray(img).save(path)
    return path, img


def test_extractor_keep_on_device_sparse(tmp_path):
    path, img = _save_image(tmp_path, seed=1)
    kps = np.array([[40.0, 30.0], [10.0, 10.0], [70.0, 50.0]])
    conf = {"model": {"name": "image"}, "max_edge": 100, "patch_size": 8,
            "dtype": "float32", "l2_normalize": False}

    host = FeatureExtractor(conf)(path, keypoints=kps)[0]
    dev = FeatureExtractor({**conf, "keep_on_device": True})(
        path, keypoints=kps)[0]

    assert isinstance(dev, DeviceFeatureMap)
    assert isinstance(dev.batch, jax.Array)
    assert dev.keypoint_ids() == host.keypoint_ids()
    for i in range(len(kps)):
        hp, dp = host.get_patch(i), dev.get_patch(i)
        np.testing.assert_array_equal(hp.corner, dp.corner)
        np.testing.assert_allclose(hp.data, dp.data, atol=1e-6)


def test_extractor_keep_on_device_dense(tmp_path):
    path, img = _save_image(tmp_path, seed=2, shape=(40, 50, 3))
    conf = {"model": {"name": "image"}, "sparse": False, "dtype": "float32",
            "l2_normalize": True}
    host = FeatureExtractor(conf)(path)[0]
    dev = FeatureExtractor({**conf, "keep_on_device": True})(path)[0]
    assert isinstance(dev, DeviceFeatureMap) and dev.is_dense
    np.testing.assert_allclose(host.get_patch(kDensePatchId).data,
                               np.asarray(dev.batch), atol=1e-6)


def _device_fset(fset: FeatureSet) -> FeatureSet:
    """Clone a host FeatureSet with every map as a DeviceFeatureMap."""
    out = FeatureSet(fset.channels, fset.patch_size, fset.dtype)
    for name, fmap in fset.maps.items():
        if fmap.is_dense:
            p = fmap.get_patch(kDensePatchId)
            out.emplace(name, DeviceFeatureMap(
                jnp.asarray(p.data), None, None, p.scale, is_sparse=False,
                upsampling_factor=p.upsampling_factor, corner=p.corner))
        else:
            ids = fmap.keypoint_ids()
            batch = jnp.asarray(np.stack(
                [fmap.patches[i].data for i in ids]))
            corners = np.stack([fmap.patches[i].corner for i in ids])
            p0 = fmap.patches[ids[0]]
            out.emplace(name, DeviceFeatureMap(
                batch, ids, corners, p0.scale,
                upsampling_factor=p0.upsampling_factor))
    return out


def test_featureview_device_parity_sparse():
    _, _, fset, keypoints, matches, names = make_scene(seed=5)
    dset = _device_fset(fset)
    req = {n: list(range(6)) for n in names}
    vh = FeatureView(fset, req, keypoints=keypoints)
    vd = FeatureView(dset, req, keypoints=keypoints)
    assert isinstance(vd.packed.patches, jax.Array)
    assert vh.packed.index == vd.packed.index
    np.testing.assert_array_equal(vh.packed.corners, vd.packed.corners)
    np.testing.assert_allclose(np.asarray(vd.packed.patches),
                               vh.packed.patches, atol=1e-6)


def test_featureview_device_parity_dense_window_cut():
    rng = np.random.default_rng(7)
    H, W, C, ps = 48, 64, 4, 8
    field = rng.normal(0, 1, (H, W, C)).astype(np.float32)
    kps = rng.uniform(2, 40, (5, 2))

    host = FeatureSet(channels=C, patch_size=ps, dtype="float32")
    host.emplace("a.jpg", FeatureMap.from_arrays(
        field[None], [kDensePatchId], np.zeros((1, 2), np.int64),
        np.ones(2), is_sparse=False))
    dev = FeatureSet(channels=C, patch_size=ps, dtype="float32")
    dev.emplace("a.jpg", DeviceFeatureMap(
        jnp.asarray(field), None, None, np.ones(2), is_sparse=False))

    req = {"a.jpg": [0, 1, 2, 3, 4]}
    kpd = {"a.jpg": kps}
    vh = FeatureView(host, req, keypoints=kpd)
    vd = FeatureView(dev, req, keypoints=kpd)
    assert isinstance(vd.packed.patches, jax.Array)
    assert vh.packed.index == vd.packed.index
    np.testing.assert_array_equal(vh.packed.corners, vd.packed.corners)
    np.testing.assert_allclose(np.asarray(vd.packed.patches),
                               vh.packed.patches, atol=1e-6)


def test_featureview_mixed_host_device():
    _, _, fset, keypoints, matches, names = make_scene(seed=9)
    mixed = FeatureSet(fset.channels, fset.patch_size, fset.dtype)
    dset = _device_fset(fset)
    for i, n in enumerate(names):
        mixed.emplace(n, dset.maps[n] if i % 2 == 0 else fset.maps[n])
    req = {n: list(range(6)) for n in names}
    vh = FeatureView(fset, req, keypoints=keypoints)
    vm = FeatureView(mixed, req, keypoints=keypoints)
    assert isinstance(vm.packed.patches, jax.Array)
    assert vh.packed.index == vm.packed.index
    np.testing.assert_allclose(np.asarray(vm.packed.patches),
                               vh.packed.patches, atol=1e-6)


def test_ka_refine_device_parity():
    from pixsfm_tpu.keypoint_adjustment import (FeatureMetricKeypointAdjuster,
                                                build_matching_graph)

    conf = {"interpolation": {"mode": "BICUBIC", "l2_normalize": True},
            "optimizer": {"loss": {"name": "trivial", "params": []}}}

    _, _, fset, kp_host, matches, names = make_scene(seed=11)
    kp_dev = {k: v.copy() for k, v in kp_host.items()}
    graph = build_matching_graph(matches)

    FeatureMetricKeypointAdjuster(conf).refine_multilevel(
        kp_host, _Manager(fset), graph)
    graph2 = build_matching_graph(matches)
    FeatureMetricKeypointAdjuster(conf).refine_multilevel(
        kp_dev, _Manager(_device_fset(fset)), graph2)

    for n in names:
        np.testing.assert_allclose(kp_dev[n], kp_host[n], atol=1e-5)


def test_features_from_image_list_keep_on_device(tmp_path):
    from pixsfm_tpu.extract import features_from_image_list

    names, kps = [], {}
    rng = np.random.default_rng(17)
    for s in range(2):
        path, _ = _save_image(tmp_path, seed=20 + s)
        names.append(path.name)
        kps[path.name] = rng.uniform(12, 40, (4, 2))

    conf = {"model": {"name": "image"}, "max_edge": 100, "patch_size": 8,
            "dtype": "float32", "l2_normalize": False}
    mgr_h = features_from_image_list(
        FeatureExtractor(conf), names, tmp_path, kps)
    mgr_d = features_from_image_list(
        FeatureExtractor({**conf, "keep_on_device": True}), names, tmp_path,
        kps)

    for n in names:
        fm_d = mgr_d.fset(0).get_map(n)
        assert isinstance(fm_d, DeviceFeatureMap)
        fm_h = mgr_h.fset(0).get_map(n)
        for i in fm_h.keypoint_ids():
            np.testing.assert_allclose(fm_d.get_patch(i).data,
                                       fm_h.get_patch(i).data, atol=1e-6)


def test_feature_reference_ba_device_parity():
    """End-to-end feature-reference BA must produce the same costs and poses
    whether the feature set is host numpy or device-resident."""
    from pixsfm_tpu.bundle_adjustment import FeatureReferenceBundleAdjuster
    from test_feature_reference_ba import featuremetric_scene, perturb

    conf = {
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
        "optimizer": {"loss": {"name": "trivial", "params": []},
                      "solver": {"max_num_iterations": 15,
                                 "use_inner_iterations": False}},
        "references": {"loss": {"name": "cauchy", "params": [0.25]},
                       "iters": 20},
    }
    rng = np.random.default_rng(21)
    rec_h, fset = featuremetric_scene(seed=21)
    perturb(rec_h, rng, pose_rot=0.002, pose_t=0.01, point_sigma=0.02)
    rec_d = rec_h.copy()

    out_h = FeatureReferenceBundleAdjuster(conf).refine(rec_h, fset)
    out_d = FeatureReferenceBundleAdjuster(conf).refine(
        rec_d, _device_fset(fset))

    np.testing.assert_allclose(out_d["initial_cost"], out_h["initial_cost"],
                               rtol=1e-5)
    np.testing.assert_allclose(out_d["final_cost"], out_h["final_cost"],
                               rtol=1e-4)
    for iid in rec_h.images:
        np.testing.assert_allclose(rec_d.images[iid].tvec,
                                   rec_h.images[iid].tvec, atol=1e-5)


def test_pack_query_fmap_device():
    from pixsfm_tpu.localization.main import _pack_query_fmap

    rng = np.random.default_rng(13)
    ps, C, n = 8, 4, 6
    patches = rng.normal(0, 1, (n, ps, ps, C)).astype(np.float32)
    corners = rng.integers(0, 30, (n, 2))
    ids = list(range(n))
    host = FeatureMap.from_arrays(patches, ids, corners, np.ones(2))
    dev = DeviceFeatureMap(jnp.asarray(patches), ids, corners, np.ones(2))

    ph, ch, sh, uh, rh = _pack_query_fmap(host)
    pd, cd, sd, ud, rd = _pack_query_fmap(dev)
    assert rh == rd
    np.testing.assert_allclose(np.asarray(pd), ph, atol=1e-6)
    np.testing.assert_array_equal(cd, ch)
    np.testing.assert_array_equal(sd, sh)
    np.testing.assert_array_equal(ud, uh)
