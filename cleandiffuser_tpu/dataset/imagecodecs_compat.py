"""Jpeg2k zarr codec registration (gated).

The reference vendors a 1,384-line numcodecs registry
(cleandiffuser/dataset/imagecodecs.py:76-1353) of which only the Jpeg2k
codec is used — by RobomimicImageDataset to store camera frames compressed
in zarr (reference robomimic_dataset.py:11,17). This module provides the
same `register_codecs()` entry point, delegating to the `imagecodecs`
package when present and degrading to a clear error otherwise (this image
stores camera frames as raw uint8 chunks by default, so the codec is only
needed to READ reference-produced zarr stores).
"""

from __future__ import annotations

__all__ = ["Jpeg2k", "register_codecs"]

try:
    from imagecodecs.numcodecs import Jpeg2k, register_codecs  # type: ignore
except Exception:  # pragma: no cover - imagecodecs not installed here
    Jpeg2k = None

    def register_codecs(*a, **k):
        raise ImportError(
            "imagecodecs is not installed; Jpeg2k-compressed zarr stores "
            "(reference robomimic image datasets) cannot be decoded. "
            "Re-encode with raw uint8 chunks or install imagecodecs."
        )
