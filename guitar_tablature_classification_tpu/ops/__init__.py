from .cqt import CQTFrontend, reflect_index
from .cqt_kernels import (
    CQTFilterbank,
    bin_frequencies,
    cqt_reference,
    make_filterbank,
    n_frames_for,
)
from .framing import frame_track, num_windows, window_times

__all__ = [
    "CQTFrontend",
    "CQTFilterbank",
    "bin_frequencies",
    "cqt_reference",
    "make_filterbank",
    "n_frames_for",
    "reflect_index",
    "frame_track",
    "num_windows",
    "window_times",
]
