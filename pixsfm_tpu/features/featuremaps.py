"""Feature storage: patches, maps, sets, manager, views.

Behavioral counterpart of the reference's feature containers
(pixsfm/features/src/featurepatch.h, featuremap.cc, featureset.cc, featuremanager.cc,
featureview.cc) redesigned for TPU consumption:

- Host side: numpy-backed ``FeaturePatch``/``FeatureMap``/``FeatureSet``/``FeatureManager``
  with the same hierarchy, coordinate transforms (featurepatch.h:252-262) and dense-map
  sentinel (``kDensePatchId``, util/src/types.h:33).
- Device side: :class:`PackedFeatures` — one stacked ``[B, ps, ps, C]`` array per view
  plus ``corners``/``scales`` and an index map, ready for batched interpolation. This
  replaces the reference's refcounted per-patch on-demand cache (featureset.cc:56-160)
  with "gather the rows a program slice needs, ship one contiguous batch to HBM".
- ``FeatureView`` resolves which (image, keypoint) pairs a solve touches (from a match
  graph or a reconstruction — featureview.cc:7-114) and packs exactly those patches,
  loading them from the H5 cache on demand when the set is cache-backed.

dtype policy: storage is bf16 (config name "half" maps here; f16 also supported for
exact cache interop), compute is f32 — SURVEY.md §7 "Half-precision semantics".
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Mapping, Optional, Sequence, Tuple

import numpy as np


__all__ = [
    "kDensePatchId", "FeaturePatch", "FeatureMap", "DeviceFeatureMap",
    "FeatureSet", "FeatureManager", "FeatureView", "PackedFeatures",
]

# Sentinel keypoint id under which a dense featuremap patch is stored
# (reference: util/src/types.h:33).
kDensePatchId = 1000000

_DTYPE_MAP = {
    "half": np.float16, "float16": np.float16, "bfloat16": "bfloat16",
    "float": np.float32, "float32": np.float32,
    "double": np.float64, "float64": np.float64,
}


def storage_dtype(name: str):
    if name == "bfloat16":
        import ml_dtypes
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(_DTYPE_MAP.get(name, name))


@dataclass
class FeaturePatch:
    """One [H, W, C] patch cut from a featuremap.

    ``corner``: featuremap pixel of the patch origin; ``scale``: featuremap/image
    ratio per axis; ``upsampling_factor``: costmap upsampling (reference:
    featurepatch.h:63-79, :252-262).
    """
    data: np.ndarray                    # [H, W, C]
    corner: np.ndarray                  # [2] (x, y) int
    scale: np.ndarray                   # [2] (sx, sy)
    upsampling_factor: float = 1.0

    def __post_init__(self):
        self.data = np.asarray(self.data)
        self.corner = np.asarray(self.corner).reshape(2)
        self.scale = np.asarray(self.scale, dtype=np.float64).reshape(2)

    @property
    def shape(self):
        return self.data.shape

    @property
    def height(self):
        return self.data.shape[0]

    @property
    def width(self):
        return self.data.shape[1]

    @property
    def channels(self):
        return self.data.shape[2]

    def to_pixel_coordinates(self, xy):
        """Image coords -> patch pixel coords (featurepatch.h:252-256)."""
        xy = np.asarray(xy, dtype=np.float64)
        return (xy * self.scale - 0.5 - self.corner) * self.upsampling_factor

    def to_image_coordinates(self, uv):
        """Patch pixel coords -> image coords (featurepatch.h:258-262)."""
        uv = np.asarray(uv, dtype=np.float64)
        return (uv / self.upsampling_factor + self.corner + 0.5) / self.scale


class FeatureMap:
    """Per-image collection {keypoint_id -> FeaturePatch}; dense maps store one
    patch under ``kDensePatchId`` (reference: featuremap.h:103-118)."""

    def __init__(self, patches: Optional[Mapping[int, FeaturePatch]] = None,
                 is_sparse: bool = True):
        self.patches: Dict[int, FeaturePatch] = dict(patches or {})
        self.is_sparse = is_sparse

    @classmethod
    def from_arrays(cls, patches: np.ndarray, keypoint_ids: Sequence[int],
                    corners: np.ndarray, scale, is_sparse: bool = True,
                    upsampling_factor: float = 1.0) -> "FeatureMap":
        """Zero-copy-ish construction from stacked arrays (featuremap.cc:8-45)."""
        fmap = cls(is_sparse=is_sparse)
        corners = np.asarray(corners)
        for i, kid in enumerate(keypoint_ids):
            fmap.patches[int(kid)] = FeaturePatch(
                patches[i], corners[i] if len(corners) > 1 else corners[0],
                scale, upsampling_factor)
        return fmap

    @property
    def is_dense(self) -> bool:
        return kDensePatchId in self.patches

    def keypoint_ids(self) -> List[int]:
        return list(self.patches.keys())

    def get_patch(self, p2D_idx: int) -> FeaturePatch:
        if self.is_dense:
            return self.patches[kDensePatchId]
        return self.patches[p2D_idx]

    def __contains__(self, p2D_idx: int) -> bool:
        return self.is_dense or p2D_idx in self.patches

    def __len__(self):
        return len(self.patches)


class DeviceFeatureMap:
    """Per-image featuremap whose patch payload stays on the accelerator.

    The host-side :class:`FeatureMap` round-trips every patch through numpy;
    on a remote accelerator the device->host->device copy of the patch stack
    dominates the end-to-end KA/BA wall clock (a 10-image scene at 4k
    keypoints x 16x16x128 bf16 is ~2.6 GB each way). This container keeps the
    stacked patches as a device array straight out of extraction;
    :class:`FeatureView` recognizes it and assembles ``PackedFeatures.patches``
    with on-device gathers, so patch data never touches the host between
    extraction and the solvers. Metadata (ids, corners, scale) stays on host.

    Sparse form: ``batch [N, ps, ps, C]`` aligned with ``keypoint_ids`` /
    ``corners [N, 2]``. Dense form: ``batch [h, w, C]`` (the reference's
    ``kDensePatchId`` map, featuremap.h:103-118) with a single ``corner``.
    """

    def __init__(self, batch, keypoint_ids: Optional[Sequence[int]],
                 corners: Optional[np.ndarray], scale,
                 is_sparse: bool = True, upsampling_factor: float = 1.0,
                 corner=(0, 0)):
        self.batch = batch
        self.is_sparse = is_sparse
        self.scale = np.asarray(scale, np.float64).reshape(2)
        self.upsampling_factor = float(upsampling_factor)
        if is_sparse:
            if keypoint_ids is None or corners is None:
                raise ValueError("sparse DeviceFeatureMap needs ids + corners")
            self._ids = [int(k) for k in keypoint_ids]
            self.corners = np.asarray(corners, np.int64).reshape(-1, 2)
            self._row = {k: i for i, k in enumerate(self._ids)}
            self.corner = None
        else:
            self._ids = [kDensePatchId]
            self._row = {}
            self.corners = None
            self.corner = np.asarray(corner, np.int64).reshape(2)

    @property
    def is_dense(self) -> bool:
        return not self.is_sparse

    def keypoint_ids(self) -> List[int]:
        return list(self._ids)

    def row_of(self, p2D_idx: int) -> int:
        return self._row.get(int(p2D_idx), -1)

    def __contains__(self, p2D_idx: int) -> bool:
        return self.is_dense or int(p2D_idx) in self._row

    def __len__(self):
        return len(self._ids)

    def get_patch(self, p2D_idx: int) -> FeaturePatch:
        """Host materialization fallback (one device->host copy per call);
        bulk consumers should go through :class:`FeatureView` instead."""
        if self.is_dense:
            return FeaturePatch(np.asarray(self.batch), self.corner,
                                self.scale, self.upsampling_factor)
        r = self.row_of(p2D_idx)
        if r < 0:
            raise KeyError(p2D_idx)
        return FeaturePatch(np.asarray(self.batch[r]), self.corners[r],
                            self.scale, self.upsampling_factor)

    def to_host(self) -> FeatureMap:
        """Full host copy as a classic :class:`FeatureMap` (cache writes)."""
        if self.is_dense:
            return FeatureMap.from_arrays(
                np.asarray(self.batch)[None], [kDensePatchId],
                self.corner[None], self.scale, is_sparse=False,
                upsampling_factor=self.upsampling_factor)
        return FeatureMap.from_arrays(
            np.asarray(self.batch), self._ids, self.corners, self.scale,
            is_sparse=True, upsampling_factor=self.upsampling_factor)


def _compiled_window_cut(ps: int):
    """Jitted batched fixed-size window slice out of a dense device map
    (device-side equivalent of the host slicing in FeatureView; one dispatch
    per image instead of one host slice per keypoint)."""
    import jax

    global _WINDOW_CUT_CACHE
    try:
        cache = _WINDOW_CUT_CACHE
    except NameError:
        cache = _WINDOW_CUT_CACHE = {}
    if ps not in cache:
        @jax.jit
        def run(fmap, corners):
            def one(c):
                return jax.lax.dynamic_slice(
                    fmap, (c[1], c[0], 0), (ps, ps, fmap.shape[-1]))
            return jax.vmap(one)(corners)
        cache[ps] = run
    return cache[ps]


class FeatureSet:
    """One CNN level: {image_name -> FeatureMap}; optionally backed by an H5 cache
    from which maps are loaded on demand (reference: featureset.cc:56-160)."""

    def __init__(self, channels: int, patch_size: int, dtype: str = "half",
                 h5_path=None, h5_key: Optional[str] = None):
        self.channels = channels
        self.patch_size = patch_size
        self.dtype = dtype
        self.maps: Dict[str, FeatureMap] = {}
        self.h5_path = h5_path
        self.h5_key = h5_key

    def emplace(self, image_name: str, fmap: FeatureMap) -> None:
        self.maps[image_name] = fmap

    def has_image(self, image_name: str) -> bool:
        return image_name in self.maps or self._in_cache(image_name)

    def _in_cache(self, image_name: str) -> bool:
        if self.h5_path is None:
            return False
        from .h5cache import cache_has_image
        return cache_has_image(self.h5_path, self.h5_key, image_name)

    def get_map(self, image_name: str,
                required_ids: Optional[Sequence[int]] = None) -> FeatureMap:
        if image_name in self.maps:
            return self.maps[image_name]
        if self.h5_path is not None:
            from .h5cache import load_featuremap
            fmap = load_featuremap(self.h5_path, self.h5_key, image_name,
                                   required_ids)
            # On-demand cache semantics: don't retain (featureset Unload path);
            # FeatureView holds the packed copy for the duration of a solve.
            return fmap
        raise KeyError(image_name)

    def unload(self, image_name: Optional[str] = None):
        if image_name is None:
            self.maps.clear()
        else:
            self.maps.pop(image_name, None)

    def flush(self):  # parity no-op: writes happen through h5cache writers
        return None

    def image_names(self) -> List[str]:
        names = set(self.maps.keys())
        if self.h5_path is not None:
            from .h5cache import cache_image_names
            names.update(cache_image_names(self.h5_path, self.h5_key))
        return sorted(names)


class FeatureManager:
    """All levels of a feature pyramid (reference: featuremanager.{h,cc})."""

    def __init__(self, channels_per_level: Sequence[int], patch_size: int,
                 dtype: str = "half", h5_path=None):
        self.channels_per_level = list(channels_per_level)
        self.patch_size = patch_size
        self.dtype = dtype
        self.levels: List[FeatureSet] = [
            FeatureSet(c, patch_size, dtype, h5_path=h5_path,
                       h5_key=f"level_{i}")
            for i, c in enumerate(self.channels_per_level)]

    @classmethod
    def from_cache(cls, h5_path) -> "FeatureManager":
        from .h5cache import read_cache_metadata
        channels_per_level, patch_size, dtype = read_cache_metadata(h5_path)
        return cls(channels_per_level, patch_size, dtype, h5_path=h5_path)

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    def fset(self, level: int) -> FeatureSet:
        return self.levels[level]


# ---------------------------------------------------------------------------
# device-side packed view
# ---------------------------------------------------------------------------

@dataclass
class PackedFeatures:
    """Stacked patches for a solve: the TPU-native FeatureView payload.

    ``index``: {(image_name, p2D_idx) -> row}. ``patches`` is kept in the storage
    dtype; convert to f32 inside kernels.
    """
    patches: np.ndarray          # [B, ps, ps, C]
    corners: np.ndarray          # [B, 2] float64 (x, y)
    scales: np.ndarray           # [B, 2] float64 (sx, sy)
    upsampling: np.ndarray       # [B] float32
    index: Dict[Tuple[str, int], int]
    # for dense maps the same row serves all keypoints of the image
    dense_images: Dict[str, int] = field(default_factory=dict)

    @property
    def num_patches(self) -> int:
        return self.patches.shape[0]

    @property
    def channels(self) -> int:
        return self.patches.shape[-1]

    def row(self, image_name: str, p2D_idx: int) -> int:
        if image_name in self.dense_images:
            return self.dense_images[image_name]
        return self.index[(image_name, p2D_idx)]

    def row_or(self, image_name: str, p2D_idx: int, default: int = -1) -> int:
        """Like :meth:`row` but returns ``default`` for observations that
        were never extracted (e.g. reprojection behind the camera)."""
        if image_name in self.dense_images:
            return self.dense_images[image_name]
        return self.index.get((image_name, p2D_idx), default)

    def rows(self, pairs: Iterable[Tuple[str, int]]) -> np.ndarray:
        return np.asarray([self.row(n, i) for n, i in pairs], dtype=np.int32)

    def rows_for_image(self, image_name: str,
                       p2D_idxs: np.ndarray) -> np.ndarray:
        """Vectorized :meth:`row` for many keypoints of ONE image.

        Builds (and caches) a dense ``p2D_idx -> row`` array per image from
        the index dict, so packing large scenes is numpy-indexing instead of
        a Python dict lookup per keypoint."""
        p2D_idxs = np.asarray(p2D_idxs, np.int64)
        if image_name in self.dense_images:
            return np.full(len(p2D_idxs), self.dense_images[image_name],
                           np.int64)
        cache = self.__dict__.setdefault("_image_row_cache", {})
        if not cache:
            # one pass over the whole index builds every image's LUT
            per_image: Dict[str, list] = {}
            for (n, i), row in self.index.items():
                per_image.setdefault(n, []).append((i, row))
            for n, pairs in per_image.items():
                arr = np.asarray(pairs, np.int64)
                lut_n = np.full(int(arr[:, 0].max()) + 1, -1, np.int64)
                lut_n[arr[:, 0]] = arr[:, 1]
                cache[n] = lut_n
        lut = cache.get(image_name)
        if lut is None:
            raise KeyError(image_name)
        rows = lut[p2D_idxs]
        if (rows < 0).any():
            missing = p2D_idxs[rows < 0][:5]
            raise KeyError(f"{image_name}: keypoints {missing} not packed")
        return rows


def _assemble_parts(parts):
    """Stack FeatureView parts into the packed ``[B, h, w, C]`` patch array.

    All-host parts -> plain np.stack (unchanged legacy path). Any device part
    -> host rows are shipped up once and everything is concatenated on device,
    preserving row order; dtypes are unified to the first device part's dtype
    (storage dtype differences only arise when host- and device-extracted maps
    are mixed in one view).
    """
    row_shapes = {(tuple(p.shape) if kind == "host" else tuple(p.shape[1:]))
                  for kind, p in parts}
    if len(row_shapes) > 1:
        raise ValueError(
            "cannot stack featuremaps of differing shapes "
            f"({row_shapes}); pass keypoints= for dense maps or use "
            "sparse extraction")
    if all(kind == "host" for kind, _ in parts):
        return np.stack([p for _, p in parts])

    import jax.numpy as jnp
    dev_dtype = next(p.dtype for kind, p in parts if kind == "dev")
    arrs = []
    host_buf: List[np.ndarray] = []

    def flush():
        if host_buf:
            stacked = np.stack(host_buf)
            if stacked.dtype != dev_dtype:
                stacked = stacked.astype(np.float32)
            arrs.append(jnp.asarray(stacked).astype(dev_dtype))
            host_buf.clear()

    for kind, p in parts:
        if kind == "host":
            host_buf.append(np.asarray(p))
        else:
            flush()
            arrs.append(p if p.dtype == dev_dtype else p.astype(dev_dtype))
    flush()
    return arrs[0] if len(arrs) == 1 else jnp.concatenate(arrs, axis=0)


class FeatureView:
    """Packs exactly the patches a solve touches (reference: featureview.cc:7-114).

    Construction options mirror the reference factories: from an explicit
    ``{image: [p2D_idx]}`` request, from a graph node subset, or from a
    reconstruction's observations.
    """

    def __init__(self, fset: FeatureSet,
                 required: Mapping[str, Sequence[int]],
                 keypoints: Optional[Mapping[str, np.ndarray]] = None):
        """``keypoints``: image coords per image, required for slicing dense
        maps into per-keypoint windows (dense-stored / sparse-packed mode —
        the reference's dense slicing, featuremap.cc:160-168)."""
        self.fset = fset
        ps = fset.patch_size
        # ``parts`` preserves row order; each element is ("host", one [h,w,C]
        # row) or ("dev", a device batch of consecutive rows). When every map
        # is host-backed this degenerates to the plain np.stack path; when
        # any map is a DeviceFeatureMap, assembly happens on device and the
        # patch payload never round-trips through the host.
        parts: List[Tuple[str, object]] = []
        n_rows = 0
        corners = []
        scales = []
        ups = []
        index: Dict[Tuple[str, int], int] = {}
        dense_images: Dict[str, int] = {}
        n_missing = 0
        for image_name, ids in required.items():
            fmap = fset.get_map(image_name, required_ids=list(ids))
            if isinstance(fmap, DeviceFeatureMap):
                kps = None if keypoints is None else keypoints.get(image_name)
                if fmap.is_dense and kps is not None:
                    # batched on-device window cut around each keypoint
                    fh, fw = fmap.batch.shape[:2]
                    want = [int(i) for i in ids
                            if (image_name, int(i)) not in index]
                    if not want:
                        continue
                    xy = np.asarray(kps, np.float64)[want]
                    cpix = xy * fmap.scale - 0.5
                    cs = np.clip(
                        np.floor(cpix - ps / 2).astype(np.int64) +
                        fmap.corner.astype(np.int64),
                        [0, 0], [max(fw - ps, 0), max(fh - ps, 0)])
                    import jax.numpy as jnp
                    cut = _compiled_window_cut(ps)
                    parts.append(("dev", cut(fmap.batch,
                                             jnp.asarray(cs, jnp.int32))))
                    for j, p2D_idx in enumerate(want):
                        index[(image_name, p2D_idx)] = n_rows
                        n_rows += 1
                        corners.append(cs[j])
                        scales.append(fmap.scale)
                        ups.append(fmap.upsampling_factor)
                    continue
                if fmap.is_dense:
                    # whole dense map as one shared patch (single-image use)
                    dense_images[image_name] = n_rows
                    parts.append(("dev", fmap.batch[None]))
                    n_rows += 1
                    corners.append(fmap.corner)
                    scales.append(fmap.scale)
                    ups.append(fmap.upsampling_factor)
                    continue
                want_rows = []
                for p2D_idx in ids:
                    key = (image_name, int(p2D_idx))
                    if key in index:
                        continue
                    r = fmap.row_of(int(p2D_idx))
                    if r < 0:
                        n_missing += 1
                        continue
                    index[key] = n_rows
                    n_rows += 1
                    corners.append(fmap.corners[r])
                    scales.append(fmap.scale)
                    ups.append(fmap.upsampling_factor)
                    want_rows.append(r)
                if want_rows:
                    sel = np.asarray(want_rows)
                    if len(sel) == len(fmap) and \
                            (sel == np.arange(len(fmap))).all():
                        parts.append(("dev", fmap.batch))  # full map, in order
                    else:
                        import jax.numpy as jnp
                        parts.append(("dev", jnp.take(
                            fmap.batch, jnp.asarray(sel, jnp.int32), axis=0)))
                continue
            if fmap.is_dense:
                patch = fmap.get_patch(kDensePatchId)
                kps = None if keypoints is None else keypoints.get(image_name)
                if kps is None:
                    # whole dense map as one shared patch (single-image use)
                    dense_images[image_name] = n_rows
                    parts.append(("host", patch.data))
                    n_rows += 1
                    corners.append(patch.corner)
                    scales.append(patch.scale)
                    ups.append(patch.upsampling_factor)
                    continue
                # slice fixed-size windows around each requested keypoint
                fh, fw = patch.data.shape[:2]
                for p2D_idx in ids:
                    key = (image_name, int(p2D_idx))
                    if key in index:
                        continue
                    xy = np.asarray(kps[int(p2D_idx)], np.float64)
                    cpix = xy * patch.scale - 0.5
                    corner = np.clip(
                        np.floor(cpix - ps / 2).astype(np.int64) +
                        patch.corner.astype(np.int64),
                        [0, 0], [max(fw - ps, 0), max(fh - ps, 0)])
                    cx, cy = int(corner[0]), int(corner[1])
                    index[key] = n_rows
                    n_rows += 1
                    parts.append(("host", patch.data[cy:cy + ps, cx:cx + ps]))
                    corners.append(corner)
                    scales.append(patch.scale)
                    ups.append(patch.upsampling_factor)
                continue
            for p2D_idx in ids:
                key = (image_name, int(p2D_idx))
                if key in index:
                    continue
                if int(p2D_idx) not in fmap.patches:
                    # observation not extracted (e.g. reprojection behind the
                    # camera / outside the image at extraction time): skip —
                    # consumers treat missing rows as invalid observations
                    n_missing += 1
                    continue
                patch = fmap.get_patch(int(p2D_idx))
                index[key] = n_rows
                n_rows += 1
                parts.append(("host", patch.data))
                corners.append(patch.corner)
                scales.append(patch.scale)
                ups.append(patch.upsampling_factor)
        if n_missing:
            from .. import logger
            logger.warning(
                "FeatureView: %d requested observation(s) have no extracted "
                "patch; treating them as invalid.", n_missing)
        if n_rows:
            patches = _assemble_parts(parts)
            self.packed = PackedFeatures(
                patches=patches,
                corners=np.asarray(corners, dtype=np.float64).reshape(-1, 2),
                scales=np.asarray(scales, dtype=np.float64).reshape(-1, 2),
                upsampling=np.asarray(ups, dtype=np.float32),
                index=index, dense_images=dense_images)
        else:
            C = fset.channels
            self.packed = PackedFeatures(
                np.zeros((0, ps, ps, C)), np.zeros((0, 2)), np.ones((0, 2)),
                np.ones((0,), np.float32), {}, {})

    # -- factory helpers (reference featureview.cc factories) ---------------
    @classmethod
    def from_graph(cls, fset: FeatureSet, graph,
                   node_subset: Optional[Sequence[int]] = None,
                   keypoints: Optional[Mapping[str, np.ndarray]] = None
                   ) -> "FeatureView":
        image_ids, feature_idxs = graph.nodes_array()
        node_ids = (np.arange(graph.num_nodes) if node_subset is None
                    else np.asarray(node_subset))
        required: Dict[str, List[int]] = {}
        for nid in node_ids:
            name = graph.image_id_to_name[int(image_ids[nid])]
            required.setdefault(name, []).append(int(feature_idxs[nid]))
        return cls(fset, required, keypoints=keypoints)

    @classmethod
    def from_reconstruction(cls, fset: FeatureSet, reconstruction,
                            point3D_ids: Optional[Sequence[int]] = None
                            ) -> "FeatureView":
        required: Dict[str, List[int]] = {}
        p3D_ids = (reconstruction.points3D.keys() if point3D_ids is None
                   else point3D_ids)
        for pid in p3D_ids:
            p3D = reconstruction.points3D[pid]
            for image_id, p2D_idx in p3D.track:
                name = reconstruction.images[image_id].name
                required.setdefault(name, []).append(int(p2D_idx))
        # dense maps are sliced around the stored observation coordinates
        keypoints = {im.name: im.xys for im in reconstruction.images.values()}
        return cls(fset, required, keypoints=keypoints)

    @classmethod
    def from_image_list(cls, fset: FeatureSet,
                        image_names: Sequence[str]) -> "FeatureView":
        required = {}
        for name in image_names:
            fmap = fset.get_map(name)
            required[name] = fmap.keypoint_ids()
        return cls(fset, required)
