from .cqt import CQTFrontend, reflect_index
from .cqt_kernels import (
    CQTFilterbank,
    bin_frequencies,
    cqt_reference,
    make_filterbank,
    n_frames_for,
)
from .framing import frame_track, num_windows, window_times
from .augment import add_noise, augment_batch, frequency_mask, time_mask, time_shift
from .loss import label_smoothing_loss, per_string_accuracy, smoothed_true_dist
from .normalize import (
    db_to_unit,
    imagenet_normalize,
    min_max_normalize,
    tile_channels,
    z_score_normalize,
)
from .extract import extract_windows, process_all_audio
from .resize import resize_bicubic, resize_matrix
from .smoothing import mode_filter, mode_filter_sequential

__all__ = [
    "add_noise",
    "augment_batch",
    "extract_windows",
    "process_all_audio",
    "db_to_unit",
    "frequency_mask",
    "imagenet_normalize",
    "label_smoothing_loss",
    "min_max_normalize",
    "mode_filter",
    "mode_filter_sequential",
    "per_string_accuracy",
    "resize_bicubic",
    "resize_matrix",
    "smoothed_true_dist",
    "tile_channels",
    "time_mask",
    "time_shift",
    "z_score_normalize",
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
