"""tetra_tpu: TPU-native TETRA downlink receiver framework.

See README.md for architecture, PARITY.md for the reference component map.
"""

__version__ = "0.1.0"

from . import params  # noqa: F401

__all__ = ["params", "__version__"]
