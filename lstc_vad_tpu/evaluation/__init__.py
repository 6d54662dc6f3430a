from . import metrics  # noqa: F401
from .frame_auc import (  # noqa: F401
    VideoScores,
    expand_scores_to_frames,
    part_bounds,
    part_slices,
)
