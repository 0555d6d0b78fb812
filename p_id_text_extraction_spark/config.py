"""Job configuration.

The reference keeps all knobs in one YAML read by a singleton
(`configs/config_manager.py:9-109`, `configs/base.yaml`).  We keep them in a
frozen dataclass passed explicitly to the driver; thresholds become literal
column expressions so Catalyst constant-folds them (SURVEY.md S10).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ExtractConfig:
    # segmentation -- analogue of tile_size / overlap_ratio (configs/base.yaml:12-16,
    # sahi_slicer.py:79-135).  block = overlapping char window over the
    # normalized payload, origin recorded.
    block_size: int = 256
    overlap: float = 0.1

    # detection -- analogue of CRAFT thresholds (configs/base.yaml:35-41).
    # A line is "content" iff its alnum density clears this and it is not
    # link-like; densities are computed in integer milli-units so every
    # engine agrees bit-for-bit.
    min_alnum_density_milli: int = 550
    max_sep_density_milli: int = 150

    # suppression -- contained_box_threshold 0.9 (configs/base.yaml:51,
    # grouping_logic.py:190-255): a span covered >= this fraction by the
    # running union of earlier spans is suppressed.
    contain_threshold_milli: int = 900

    # clustering -- proximity 1 (configs/base.yaml:50 analogue): spans whose
    # gap is <= proximity_gap chars join one cluster.
    proximity_gap: int = 1

    # crop -- padding + clamp (cropping_Images.py:44-47).
    pad: int = 8

    # recognition -- TrOCR confidence gate 0.95 (configs/base.yaml:43,
    # text_recognition.py:116-117): below the gate the fallback normalizer
    # runs instead of the primary one.
    conf_threshold_milli: int = 950

    # coordinate conversion -- 72/600 DPI point scaling rounded to 4 decimals
    # (src/convert_coord.py:17-23).
    coord_scale: float = 72.0 / 600.0
    coord_round: int = 4

    def validate(self) -> None:
        """Driver-side parameter validation (sahi_slicer.py:47-51 analogue)."""
        if not (0.0 < self.overlap < 1.0):
            raise ValueError(f"overlap must be in (0,1), got {self.overlap}")
        if self.block_size < 64:
            raise ValueError(f"block_size must be >= 64, got {self.block_size}")
        if self.pad < 0:
            raise ValueError(f"pad must be >= 0, got {self.pad}")

    @property
    def step(self) -> int:
        """Stride between block origins: block_size * (1 - overlap)."""
        return int(self.block_size * (1.0 - self.overlap))


DEFAULT_CONFIG = ExtractConfig()
