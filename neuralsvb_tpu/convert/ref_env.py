"""Environment shim for importing the PyTorch reference in this sandbox.

The reference (/root/reference) imports a handful of libraries that are not
installed here (librosa, parselmouth, webrtcvad, ...) but whose symbols are
never exercised by the parity suites / baseline script — they stub them with
MagicMock so the reference modules import. One shared list: the parity tests
(tests/test_parity_reference.py, tests/test_pipeline_parity.py) and
scripts/ref_baseline.py all call this instead of keeping drifting copies.
"""

from __future__ import annotations

import sys
from unittest import mock

# modules the reference imports that may be absent in this environment
REF_OPTIONAL_DEPS = [
    "chardet", "pycwt", "webrtcvad", "librosa", "librosa.filters",
    "parselmouth", "pyloudnorm", "g2p_en", "resemblyzer", "numba",
    "skimage", "skimage.transform", "pandas", "matplotlib",
    "matplotlib.pyplot", "matplotlib.ticker",
]


def stub_missing_ref_deps(extra: list[str] | None = None) -> None:
    """Install MagicMock stubs for any missing reference dependency.

    Stubs carry a real ``__name__`` (requests reads ``chardet.__name__`` at
    import time); a nameless MagicMock left in sys.modules by another test's
    fixture is repaired rather than replaced.
    """
    for m in REF_OPTIONAL_DEPS + list(extra or ()):
        try:
            __import__(m)
            # __import__ returns the TOP-LEVEL package for dotted names, so
            # inspect/repair the module actually bound at sys.modules[m] —
            # otherwise a nameless stub at e.g. "librosa.filters" survives
            # (and the parent could be stamped with the child's __name__)
            mod = sys.modules.get(m)
            if isinstance(mod, mock.MagicMock) and not hasattr(mod, "__name__"):
                mod.__name__ = m  # repair a stub installed by another test
        except ImportError:
            stub = mock.MagicMock(name=m)
            stub.__name__ = m
            sys.modules[m] = stub
