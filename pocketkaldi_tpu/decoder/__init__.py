from .beam import Beam, GraphArrays  # noqa: F401
from .decoder import Hypothesis, ViterbiDecoder  # noqa: F401
from .pooled import PooledViterbiDecoder  # noqa: F401
