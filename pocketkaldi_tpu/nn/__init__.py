from .nnet import Nnet, apply_nnet  # noqa: F401
from .am import AcousticModel, am_scores, splice_frames  # noqa: F401
