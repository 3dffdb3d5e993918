"""hloc-flavoured pipeline (reference: pixsfm/refine_hloc.py).

Adds the full mapping flows on top of :class:`pixsfm_tpu.refine_colmap.PixSfM`:
``refine_keypoints`` (hloc H5 round-trip with the +-0.5 px coordinate shift,
refine_hloc.py:83-91), ``triangulation`` (KA -> triangulate with known poses ->
BA; the reference shells out to hloc/COLMAP — here the built-in triangulator is
used), and ``reconstruction`` (KA -> incremental SfM -> BA).
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from . import logger
from .config import OmegaConf, load_config
from .refine_colmap import PixSfM as PixSfMBase
from .sfm.model import Reconstruction
from .sfm.triangulation import triangulate_reconstruction
from .keypoint_adjustment import build_matching_graph
from .util.hloc import (read_image_pairs, read_keypoints_hloc,
                        read_matches_hloc, write_keypoints_hloc)
from .util.misc import to_colmap_coordinates, to_hloc_coordinates

__all__ = ["PixSfM"]


class PixSfM(PixSfMBase):

    def refine_keypoints(self, output_path, features_path, image_dir,
                         pairs_path, matches_path, cache_path=None
                         ) -> Tuple[Dict[str, np.ndarray], Dict]:
        """KA on hloc feature/match files (reference: refine_hloc.py:72-92)."""
        pairs = read_image_pairs(pairs_path)
        keypoints = read_keypoints_hloc(features_path)
        to_colmap_coordinates(keypoints)
        matches_list, scores_list = read_matches_hloc(matches_path, pairs)
        matches = {tuple(p): m for p, m in zip(pairs, matches_list)}
        scores = {tuple(p): s for p, s in zip(pairs, scores_list)}
        keypoints, outputs = self.run_ka(keypoints, image_dir,
                                         matches=matches, scores=scores,
                                         cache_path=cache_path)
        to_hloc_coordinates(keypoints)
        write_keypoints_hloc(output_path, keypoints)
        to_colmap_coordinates(keypoints)
        return keypoints, outputs

    def triangulation(self, output_dir, reference_model_path, image_dir,
                      pairs_path, features_path, matches_path,
                      cache_path=None,
                      max_reproj_error: float = 4.0) -> Tuple[Reconstruction,
                                                              Dict]:
        """KA -> triangulation with known poses -> BA
        (reference: refine_hloc.py:117-131)."""
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        pairs = read_image_pairs(pairs_path)
        keypoints = read_keypoints_hloc(features_path)
        to_colmap_coordinates(keypoints)
        matches_list, scores_list = read_matches_hloc(matches_path, pairs)
        matches = {tuple(p): m for p, m in zip(pairs, matches_list)}
        scores = {tuple(p): s for p, s in zip(pairs, scores_list)}

        graph = build_matching_graph(matches, scores)
        outputs: Dict = {}
        keypoints, outputs["KA"] = self.run_ka(
            keypoints, image_dir, graph=graph, cache_path=cache_path)

        reference = Reconstruction.read(reference_model_path)
        reconstruction = triangulate_reconstruction(
            reference, graph, keypoints, max_reproj_error=max_reproj_error)

        outputs["BA"] = self.run_ba(reconstruction, image_dir,
                                    cache_path=cache_path)
        reconstruction.write(output_dir)
        return reconstruction, outputs

    def reconstruction(self, output_dir, image_dir, pairs_path,
                       features_path, matches_path, cache_path=None,
                       camera_model: str = "SIMPLE_RADIAL",
                       cameras=None) -> Tuple[Reconstruction, Dict]:
        """KA -> incremental SfM -> BA (reference: refine_hloc.py:26-70)."""
        from .sfm.mapper import incremental_mapping

        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        pairs = read_image_pairs(pairs_path)
        keypoints = read_keypoints_hloc(features_path)
        to_colmap_coordinates(keypoints)
        matches_list, scores_list = read_matches_hloc(matches_path, pairs)
        matches = {tuple(p): m for p, m in zip(pairs, matches_list)}
        scores = {tuple(p): s for p, s in zip(pairs, scores_list)}

        graph = build_matching_graph(matches, scores)
        outputs: Dict = {}
        keypoints, outputs["KA"] = self.run_ka(
            keypoints, image_dir, graph=graph, cache_path=cache_path)

        reconstruction = incremental_mapping(
            graph, keypoints, image_dir, camera_model=camera_model,
            cameras=cameras)
        outputs["SfM"] = {
            "num_reg_images": reconstruction.num_reg_images,
            "num_points3D": len(reconstruction.points3D)}

        outputs["BA"] = self.run_ba(reconstruction, image_dir,
                                    cache_path=cache_path)
        reconstruction.write(output_dir)
        return reconstruction, outputs

    run = reconstruction


def main():
    parser = argparse.ArgumentParser(description="pixsfm_tpu hloc refinement")
    sub = parser.add_subparsers(dest="command", required=True)

    for name in ("keypoint_adjuster", "triangulator", "reconstructor",
                 "bundle_adjuster"):
        p = sub.add_parser(name)
        p.add_argument("--image_dir", type=Path, required=True)
        p.add_argument("--config_path", type=str, default=None)
        p.add_argument("--cache_path", type=Path, default=None)
        if name == "keypoint_adjuster":
            p.add_argument("--features_path", type=Path, required=True)
            p.add_argument("--pairs_path", type=Path, required=True)
            p.add_argument("--matches_path", type=Path, required=True)
            p.add_argument("--output_path", type=Path, required=True)
        elif name == "triangulator":
            p.add_argument("--reference_model_path", type=Path, required=True)
            p.add_argument("--features_path", type=Path, required=True)
            p.add_argument("--pairs_path", type=Path, required=True)
            p.add_argument("--matches_path", type=Path, required=True)
            p.add_argument("--output_dir", type=Path, required=True)
        elif name == "reconstructor":
            p.add_argument("--features_path", type=Path, required=True)
            p.add_argument("--pairs_path", type=Path, required=True)
            p.add_argument("--matches_path", type=Path, required=True)
            p.add_argument("--output_dir", type=Path, required=True)
        elif name == "bundle_adjuster":
            p.add_argument("--input_path", type=Path, required=True)
            p.add_argument("--output_path", type=Path, required=True)
        p.add_argument("dotlist", nargs="*")

    args = parser.parse_args()
    conf = load_config(args.config_path, cli=args.dotlist) \
        if args.config_path else OmegaConf.from_dotlist(args.dotlist)
    sfm = PixSfM(conf)
    if args.command == "keypoint_adjuster":
        sfm.refine_keypoints(args.output_path, args.features_path,
                             args.image_dir, args.pairs_path,
                             args.matches_path, cache_path=args.cache_path)
    elif args.command == "triangulator":
        sfm.triangulation(args.output_dir, args.reference_model_path,
                          args.image_dir, args.pairs_path,
                          args.features_path, args.matches_path,
                          cache_path=args.cache_path)
    elif args.command == "reconstructor":
        sfm.reconstruction(args.output_dir, args.image_dir, args.pairs_path,
                           args.features_path, args.matches_path,
                           cache_path=args.cache_path)
    elif args.command == "bundle_adjuster":
        sfm.refine_reconstruction(args.output_path, args.input_path,
                                  args.image_dir, cache_path=args.cache_path)


if __name__ == "__main__":
    main()
