"""Alias package: the framework's importable name is ``tip_tpu``.

The project is referred to as transformer-inertial-poser_tpu; Python cannot
import dashed names, so the real package is ``tip_tpu`` and this module
re-exports it for discoverability.
"""
import tip_tpu
import sys as _sys

_sys.modules[__name__ + ".tip_tpu"] = tip_tpu
from tip_tpu import *  # noqa: F401,F403
