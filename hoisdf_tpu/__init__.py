"""HOISDF-TPU: TPU-native hand+object pose estimation from global SDFs.

Public API surface; see README.md for the component map against the
reference implementation.
"""

from hoisdf_tpu.config import Config, get_config

__all__ = [
    "Config",
    "get_config",
]

__version__ = "0.1.0"
