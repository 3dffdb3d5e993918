"""Named config presets (reference: pixsfm/configs/__init__.py)."""

from pathlib import Path

__all__ = ["parse_config_path", "list_configs"]


def parse_config_path(name_or_path) -> Path:
    p = Path(str(name_or_path))
    if p.exists():
        return p
    p = Path(__file__).parent / f"{name_or_path}.yaml"
    if p.exists():
        return p
    raise FileNotFoundError(
        f"config {name_or_path!r} not found; available: {list_configs()}")


def list_configs():
    return sorted(p.stem for p in Path(__file__).parent.glob("*.yaml"))
