"""Reference-descriptor cache (reference: pixsfm/features/store_references.py).

Persists the per-point3D robust references (descriptor, source observation,
optional kept observations/costs and 3D node offsets) to H5 so localization can
reload them without re-extracting dense features (SURVEY §5.4: references can be
cached/reloaded as a resume point)."""

from __future__ import annotations

from typing import Dict, List

import h5py
import numpy as np

from ..bundle_adjustment.references import Reference

__all__ = ["write_references_cache", "load_references_cache"]


def write_references_cache(path, references_per_level: List[Dict[int,
                                                                 Reference]]
                           ) -> None:
    with h5py.File(path, "w") as f:
        f.attrs["num_levels"] = len(references_per_level)
        for lvl, refs in enumerate(references_per_level):
            g = f.create_group(f"level_{lvl}")
            for pid, ref in refs.items():
                rg = g.create_group(str(int(pid)))
                rg.create_dataset("descriptor", data=ref.descriptor)
                rg.attrs["source"] = np.asarray(ref.source, np.int64)
                if ref.node_offsets3D is not None:
                    rg.create_dataset("node_offsets3D",
                                      data=ref.node_offsets3D)
                if ref.observations is not None:
                    rg.create_dataset(
                        "observations",
                        data=np.asarray(ref.observations, np.int64))
                    rg.create_dataset("costs", data=ref.costs)
                    rg.create_dataset("track_descriptors",
                                      data=ref.track_descriptors)


def load_references_cache(path) -> List[Dict[int, Reference]]:
    out: List[Dict[int, Reference]] = []
    with h5py.File(path, "r") as f:
        for lvl in range(int(f.attrs["num_levels"])):
            g = f[f"level_{lvl}"]
            refs: Dict[int, Reference] = {}
            for key in g:
                rg = g[key]
                ref = Reference(
                    source=tuple(int(v) for v in rg.attrs["source"]),
                    descriptor=rg["descriptor"][...])
                if "node_offsets3D" in rg:
                    ref.node_offsets3D = rg["node_offsets3D"][...]
                if "observations" in rg:
                    ref.observations = [tuple(int(v) for v in row)
                                        for row in rg["observations"][...]]
                    ref.costs = rg["costs"][...]
                    ref.track_descriptors = rg["track_descriptors"][...]
                refs[int(key)] = ref
            out.append(refs)
    return out
