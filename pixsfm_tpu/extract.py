"""Feature extraction orchestration (reference: pixsfm/extract.py).

- ``features_from_graph``: extract patches only at matched keypoints (KA input,
  extract.py:197-215).
- ``features_from_reconstruction``: extract at *reprojected* triangulated
  observations (BA input, extract.py:153-194).
- ``features_from_image_list``: the shared per-image loop with optional H5 cache
  append (extract.py:58-150) — the cache doubles as a resume point: if it exists
  and ``overwrite_cache`` is false, extraction is skipped (extract.py:75-81).
- ``load_features_from_cache``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from . import logger
from .features.extractor import FeatureExtractor
from .features.featuremaps import FeatureManager, FeatureMap
from .features.h5cache import init_cache, write_featuremap
from .sfm.model import Reconstruction

__all__ = [
    "features_from_graph", "features_from_reconstruction",
    "features_from_image_list", "load_features_from_cache",
]


def load_features_from_cache(cache_path) -> FeatureManager:
    return FeatureManager.from_cache(Path(cache_path))


def features_from_image_list(extractor: FeatureExtractor, image_list,
                             image_dir,
                             keypoints_per_image: Dict[str, np.ndarray],
                             keypoint_ids_per_image: Optional[Dict] = None,
                             cache_path=None) -> FeatureManager:
    image_dir = Path(image_dir)
    use_cache = bool(extractor.conf.use_cache) and cache_path is not None
    if use_cache:
        cache_path = Path(cache_path)
        if cache_path.exists() and not extractor.conf.overwrite_cache:
            logger.info("Loading features from existing cache %s", cache_path)
            return FeatureManager.from_cache(cache_path)

    channels = extractor.channels_per_level
    manager = FeatureManager(channels, int(extractor.conf.patch_size),
                             str(extractor.conf.dtype),
                             h5_path=cache_path if use_cache else None)
    if use_cache:
        init_cache(cache_path, channels, int(extractor.conf.patch_size),
                   str(extractor.conf.dtype), overwrite=True)

    # device-resident mode: skip the host dict round-trip entirely and
    # emplace DeviceFeatureMaps (patch payload stays in HBM between
    # extraction and the solvers). Mutually exclusive with the H5 cache,
    # which needs host arrays.
    keep_dev = (bool(extractor.conf.get("keep_on_device", False))
                and not use_cache)

    # image decode pipelined ahead of the device forward: while the
    # accelerator runs image N, a background thread opens/drafts/decodes
    # image N+1 (util/prefetch.py; the async half of the reference's
    # on-demand cache, SURVEY.md §2.9)
    from .util.misc import progress_iter
    from .util.prefetch import prefetch_map

    def _load(image_name):
        return image_name, extractor.load_image(image_dir / image_name)

    depth = int(extractor.conf.get("prefetch_depth", 2))
    batch_size = max(int(extractor.conf.get("batch_size", 1)), 1)

    def emit(image_name, fmaps):
        if keep_dev:
            for level, fmap in enumerate(fmaps):
                manager.fset(level).emplace(image_name, fmap)
            return
        for level, data in enumerate(fmaps):
            if use_cache:
                write_featuremap(
                    cache_path, f"level_{level}", image_name,
                    data["patches"], data["keypoint_ids"], data["corners"],
                    data["metadata"]["scale"],
                    is_sparse=data["metadata"]["is_sparse"],
                    cache_format=str(extractor.conf.cache_format))
            else:
                scale = data["metadata"]["scale"]
                fmap = FeatureMap.from_arrays(
                    data["patches"], data["keypoint_ids"], data["corners"],
                    scale, is_sparse=data["metadata"]["is_sparse"])
                manager.fset(level).emplace(image_name, fmap)

    group: list = []       # (name, img, kps, kp_ids) of equal decoded size

    def flush():
        if not group:
            return
        outs = extractor.extract_batch(
            [g[1] for g in group], [g[2] for g in group],
            keypoint_ids_list=[g[3] for g in group], as_dict=not keep_dev)
        for (name, *_), fmaps in zip(group, outs):
            emit(name, fmaps)
        group.clear()

    for image_name, img in progress_iter(
            prefetch_map(_load, list(image_list), depth=depth),
            desc="feature extraction", total=len(list(image_list))):
        kps = keypoints_per_image.get(image_name)
        kp_ids = (keypoint_ids_per_image or {}).get(image_name)
        if batch_size <= 1:
            fmaps = extractor(img, keypoints=kps, keypoint_ids=kp_ids,
                              as_dict=not keep_dev)
            emit(image_name, fmaps)
            continue
        # group consecutive same-sized images into one batched forward
        if group and (group[0][1].size != img.size
                      or len(group) >= batch_size):
            flush()
        group.append((image_name, img, kps, kp_ids))
    flush()
    return manager


def features_from_graph(extractor: FeatureExtractor, image_dir, graph,
                        keypoints_dict: Dict[str, np.ndarray],
                        cache_path=None) -> FeatureManager:
    from .keypoint_adjustment.main import extract_patchdata_from_graph
    patch_data = extract_patchdata_from_graph(graph)
    kp_per_image = {name: np.asarray(keypoints_dict[name])[ids]
                    for name, ids in patch_data.items()}
    return features_from_image_list(
        extractor, sorted(patch_data.keys()), image_dir, kp_per_image,
        keypoint_ids_per_image=patch_data, cache_path=cache_path)


def features_from_reconstruction(extractor: FeatureExtractor,
                                 reconstruction: Reconstruction, image_dir,
                                 cache_path=None) -> FeatureManager:
    """Extract at reprojected locations of triangulated observations only
    (reference: extract.py:153-194)."""
    from .localization.pnp import project_np

    kp_per_image: Dict[str, np.ndarray] = {}
    ids_per_image: Dict[str, List[int]] = {}
    for im in reconstruction.images.values():
        if not im.registered:
            continue
        cam = reconstruction.cameras[im.camera_id]
        tri = [(p2D_idx, pid) for p2D_idx, pid in enumerate(im.point3D_ids)
               if pid >= 0 and pid in reconstruction.points3D]
        if not tri:
            continue
        X = np.stack([reconstruction.points3D[pid].xyz for _, pid in tri])
        xy, depth = project_np(cam, im.qvec, im.tvec, X)
        keep = depth > 0
        if keep.any():
            kp_per_image[im.name] = xy[keep]
            ids_per_image[im.name] = [tri[i][0]
                                      for i in np.nonzero(keep)[0]]
    return features_from_image_list(
        extractor, sorted(kp_per_image.keys()), image_dir, kp_per_image,
        keypoint_ids_per_image=ids_per_image, cache_path=cache_path)
