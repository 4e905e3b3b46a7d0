from .fbank import compute_fbank, compute_fbank_np  # noqa: F401
from .cmvn import apply_cmvn, apply_cmvn_exact  # noqa: F401
