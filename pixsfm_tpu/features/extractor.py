"""Dense feature extraction driver (reference: pixsfm/features/extractor.py).

Loads images (PIL, LANCZOS resize to ``max_edge``, optional ``fast_image_load``
draft decoding, ``pyr_scales`` pyramid), runs the Flax feature model (jitted; the
one device round-trip per image), L2-normalizes, casts to the storage dtype
(``half`` maps to bfloat16 on TPU, float16 also supported for cache interop), and
emits featuremaps in the reference's three modes (extractor.py:152-236):

- sparse: per-keypoint ``[ps, ps, C]`` windows, corners clipped to the map;
- dense: the whole map as one patch under ``kDensePatchId``;
- dense-stored/sparse-loaded: dense patch + per-keypoint corners for the cache.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import PIL.Image

from ..config import merge
from .featuremaps import FeatureMap, kDensePatchId, storage_dtype
from .models import get_model

__all__ = ["FeatureExtractor", "extract_patches_numpy"]

RESIZE_FILTERS = {
    "LANCZOS": PIL.Image.LANCZOS,
    "BILINEAR": PIL.Image.BILINEAR,
    "BICUBIC": PIL.Image.BICUBIC,
    "NEAREST": PIL.Image.NEAREST,
}


def extract_patches_numpy(featuremap: np.ndarray, corners: np.ndarray,
                          ps: int) -> np.ndarray:
    """Window-gather [H, W, C] -> [N, ps, ps, C] (reference:
    features/extract_patches.py:14-44)."""
    out = np.empty((len(corners), ps, ps, featuremap.shape[-1]),
                   featuremap.dtype)
    for i, (cx, cy) in enumerate(corners):
        out[i] = featuremap[cy:cy + ps, cx:cx + ps]
    return out


from functools import lru_cache


@lru_cache(maxsize=16)
def _compiled_extract_patches(ps: int, l2: bool, dtype_str: str):
    """Device-side l2-normalize + cast + window-cut: only the [N, ps, ps, C]
    stack crosses the device->host boundary (the dense featuremap can be
    ~(H*W)/(N*ps^2) times larger — a big saving through the TPU tunnel).
    Retraces per (H, W, N) shape; dataset images share few shapes."""
    import jax
    import jax.numpy as jnp

    jdt = {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
           "float32": jnp.float32, "float64": jnp.float32}[dtype_str]

    @jax.jit
    def run(fmap, corners):
        f = fmap.astype(jnp.float32)
        if l2:
            f = f / jnp.maximum(
                jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        f = f.astype(jdt)
        C = f.shape[-1]

        def one(c):
            return jax.lax.dynamic_slice(f, (c[1], c[0], 0), (ps, ps, C))

        return jax.vmap(one)(corners)

    return run


@lru_cache(maxsize=8)
def _compiled_normalize_cast(l2: bool, dtype_str: str):
    """Device-side l2-normalize + storage cast of a whole dense map (the
    ``keep_on_device`` dense path: no host copy at all)."""
    import jax
    import jax.numpy as jnp

    jdt = {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
           "float32": jnp.float32, "float64": jnp.float32}[dtype_str]

    @jax.jit
    def run(fmap):
        f = fmap.astype(jnp.float32)
        if l2:
            f = f / jnp.maximum(
                jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        return f.astype(jdt)

    return run


class FeatureExtractor:
    default_conf = {
        "device": "auto",
        "dtype": "half",
        "fast_image_load": False,
        "l2_normalize": True,
        "max_edge": 1600,
        "model": {"name": "s2dnet"},
        "patch_size": 16,
        "pyr_scales": [1.0],
        "resize": "LANCZOS",
        "sparse": True,
        # keep extracted patches (or the dense map) on the accelerator as a
        # DeviceFeatureMap: FeatureView then packs solves with on-device
        # gathers and patch data never round-trips through the host. For
        # in-process pipelines; ignored when as_dict=True (cache writes need
        # host arrays).
        "keep_on_device": False,
        # images decoded this many ahead of the device forward by a
        # background thread (extract.features_from_image_list); 0 disables
        "prefetch_depth": 2,
        # >1: consecutive same-sized images run through ONE batched CNN
        # forward per pyramid scale (extract.features_from_image_list) —
        # fewer dispatches, better MXU utilization on small images
        "batch_size": 1,
        "use_cache": False,
        "overwrite_cache": False,
        "load_cache_on_init": False,
        "cache_format": "chunked",
    }

    # "half" storage maps to bfloat16: TPU-native 16-bit with f32 compute
    # (SURVEY.md §7 half-precision semantics). Use "float16" for byte-exact
    # interop with reference caches.
    dtype_map = {"half": "bfloat16", "float16": "float16",
                 "bfloat16": "bfloat16", "float": "float32",
                 "float32": "float32", "double": "float64"}

    def __init__(self, conf=None):
        self.conf = merge(self.default_conf, conf or {})
        model_conf = self.conf.model.to_dict() \
            if hasattr(self.conf.model, "to_dict") else dict(self.conf.model)
        name = model_conf.pop("name", "s2dnet")
        self.model = get_model(name)(model_conf)
        self.storage_dtype = self.dtype_map[str(self.conf.dtype)]

    @property
    def channels_per_level(self) -> List[int]:
        return list(self.model.output_dims) * len(self.conf.pyr_scales)

    @property
    def num_levels(self) -> int:
        return len(self.channels_per_level)

    # -- image loading ------------------------------------------------------
    def scaled_image_size(self, image: PIL.Image.Image, pyr_scale=1.0):
        w, h = image.size
        s = min(float(self.conf.max_edge) / max(w, h), 1.0) * pyr_scale
        return [int(round(s * w)), int(round(s * h))]

    def resize_image(self, image: PIL.Image.Image, pyr_scale: float):
        w_new, h_new = self.scaled_image_size(image, pyr_scale)
        if (w_new, h_new) == image.size:
            return image
        return image.resize((w_new, h_new),
                            RESIZE_FILTERS[str(self.conf.resize)])

    def load_image(self, image_path) -> PIL.Image.Image:
        """Open + decode an image for :meth:`__call__`.

        ``draft`` must run BEFORE the decode (``convert`` triggers it) for
        ``fast_image_load`` to actually use the JPEG draft-mode fast path —
        this is also the host-side half that ``extract`` pipelines ahead of
        the device forward (util/prefetch.py)."""
        img = PIL.Image.open(image_path)
        orig_size = img.size
        if self.conf.fast_image_load:
            img.draft("RGB", self.scaled_image_size(
                img, self.conf.pyr_scales[0]))
        img = img.convert("RGB")
        # draft decoding shrinks the decoded size; keypoint->featuremap
        # scales must be computed against the ORIGINAL image size
        img.original_size = orig_size
        return img

    def extract_batch(self, images: Sequence[PIL.Image.Image],
                      keypoints_list: Sequence[Optional[np.ndarray]],
                      keypoint_ids_list: Optional[Sequence] = None,
                      as_dict: bool = False) -> List[List]:
        """One model forward for a batch of images with equal decoded size.

        The per-image path dispatches one CNN forward per image; batching
        stacks the preprocessed tensors and runs ONE forward per pyramid
        scale — fewer dispatches and better MXU utilization on small
        images. The batch is padded to a power of two (repeating the first
        image; padded outputs are discarded) so group sizes map to few
        compiled programs. Returns per-image lists of fmaps, exactly like
        calling the extractor per image."""
        B = len(images)
        if B == 1:
            return [self(images[0], keypoints=keypoints_list[0],
                         keypoint_ids=(keypoint_ids_list or [None])[0],
                         as_dict=as_dict)]
        sizes = {im.size for im in images}
        if len(sizes) > 1:
            raise ValueError(f"extract_batch needs equal image sizes, "
                             f"got {sizes}")
        import jax.numpy as jnp
        B_pad = 1 << int(np.ceil(np.log2(B)))
        out: List[List] = [[] for _ in range(B)]
        for pyr_scale in self.conf.pyr_scales:
            tens = [self.model.preprocess(self.resize_image(im, pyr_scale))[0]
                    for im in images]
            tens += [tens[0]] * (B_pad - B)
            feats = self.model(jnp.asarray(np.stack(tens)))
            for fm in feats:
                for i in range(B):
                    img_size = getattr(images[i], "original_size",
                                       images[i].size)
                    kp_ids = (keypoint_ids_list[i]
                              if keypoint_ids_list is not None else None)
                    out[i].append(self._to_fmap(
                        fm[i], img_size, keypoints_list[i], kp_ids,
                        as_dict, None))
        return out

    # -- main entry ---------------------------------------------------------
    def __call__(self, image_path, keypoints: Optional[np.ndarray] = None,
                 keypoint_ids: Optional[Sequence[int]] = None,
                 as_dict: bool = False,
                 overwrite_sparse: Optional[bool] = None) -> List:
        img = (image_path if isinstance(image_path, PIL.Image.Image)
               else self.load_image(image_path))
        img_size = getattr(img, "original_size", img.size)

        fmaps = []
        for pyr_scale in self.conf.pyr_scales:
            img_pyr = self.resize_image(img, pyr_scale)
            tens = self.model.preprocess(img_pyr)
            feats = self.model(tens)
            for level, fm in enumerate(feats):
                fmaps.append(self._to_fmap(fm[0], img_size,
                                           keypoints, keypoint_ids, as_dict,
                                           overwrite_sparse))
        return fmaps

    def _to_fmap(self, fmap, image_size, keypoints, keypoint_ids,
                 as_dict, overwrite_sparse):
        """``fmap`` may be a device (jax) array — for sparse extraction the
        l2-normalize/cast/window-cut all run on device and only the
        [N, ps, ps, C] patch stack is transferred to the host (the full dense
        map can be an order of magnitude larger)."""
        sparse = (self.conf.sparse if overwrite_sparse is None
                  else overwrite_sparse)
        w, h = image_size
        ps = int(self.conf.patch_size)

        if keypoints is not None:
            keypoints = np.asarray(keypoints, np.float64).reshape(-1, 2)
            if keypoint_ids is None:
                keypoint_ids = list(range(len(keypoints)))
            elif len(keypoints) != len(keypoint_ids):
                raise ValueError("keypoints / keypoint_ids length mismatch")
        if sparse and keypoints is None:
            raise RuntimeError("sparse extraction requires keypoints")

        fh, fw, C = fmap.shape
        scale = np.array([fw / w, fh / h])

        better_sparse = (keypoints is not None
                         and fmap.size > len(keypoints) * ps * ps * C)

        keep_dev = bool(self.conf.get("keep_on_device", False)) and not as_dict

        if sparse and better_sparse:
            corners = (keypoints * scale - ps / 2.0).astype(np.int32)
            corners = np.clip(corners, [0, 0],
                              [max(fw - ps - 1, 0), max(fh - ps - 1, 0)])
            run = _compiled_extract_patches(
                ps, bool(self.conf.l2_normalize), self.storage_dtype)
            import jax.numpy as jnp
            patches_dev = run(jnp.asarray(fmap),
                              jnp.asarray(corners, jnp.int32))
            if keep_dev:
                from .featuremaps import DeviceFeatureMap
                return DeviceFeatureMap(patches_dev, list(keypoint_ids),
                                        corners, scale, is_sparse=True)
            patches = np.asarray(patches_dev)
            data = dict(patches=patches, corners=corners,
                        keypoint_ids=list(keypoint_ids),
                        metadata=dict(scale=scale, is_sparse=True,
                                      patch_size=ps))
            if as_dict:
                return data
            return FeatureMap.from_arrays(
                data["patches"], data["keypoint_ids"], data["corners"],
                scale, is_sparse=True)

        if keep_dev:
            from .featuremaps import DeviceFeatureMap
            import jax.numpy as jnp
            run = _compiled_normalize_cast(bool(self.conf.l2_normalize),
                                           self.storage_dtype)
            return DeviceFeatureMap(run(jnp.asarray(fmap)), None, None,
                                    scale, is_sparse=False)

        fmap = np.asarray(fmap)
        if self.conf.l2_normalize:
            fmap = fmap / np.maximum(
                np.linalg.norm(fmap, axis=-1, keepdims=True), 1e-12)
        fmap = fmap.astype(storage_dtype(self.storage_dtype))

        if not sparse or not self.conf.use_cache or not as_dict:
            data = dict(patches=fmap[None],
                        corners=np.array([[0, 0]], np.int32),
                        keypoint_ids=[kDensePatchId],
                        metadata=dict(scale=scale, is_sparse=False,
                                      patch_size=ps))
        else:
            # dense-stored / sparse-loaded cache mode (extractor.py:212-226)
            corners = (keypoints * scale - ps / 2.0).astype(np.int32)
            corners = np.clip(corners, [0, 0],
                              [max(fw - ps - 1, 0), max(fh - ps - 1, 0)])
            data = dict(patches=fmap[None], corners=corners,
                        keypoint_ids=list(keypoint_ids),
                        metadata=dict(scale=scale, is_sparse=False,
                                      patch_size=ps))

        if as_dict:
            return data
        return FeatureMap.from_arrays(
            data["patches"], data["keypoint_ids"], data["corners"], scale,
            is_sparse=data["metadata"]["is_sparse"])

    # -- memory estimation (reference extractor.py:242-264) -----------------
    def estimate_req_memory(self, image_path, num_kps: int) -> float:
        n_bytes = {"bfloat16": 2, "float16": 2, "float32": 4,
                   "float64": 8}[self.storage_dtype]
        if self.conf.sparse:
            return (self.conf.patch_size ** 2 * sum(self.channels_per_level)
                    * num_kps * n_bytes)
        if self.model.scales is None:
            return float("nan")
        image = PIL.Image.open(image_path)
        req = 0.0
        for pyr_scale in self.conf.pyr_scales:
            w, h = self.scaled_image_size(image, pyr_scale)
            for i, c in enumerate(self.model.output_dims):
                req += w * h / self.model.scales[i] ** 2 * c * n_bytes
        return req
