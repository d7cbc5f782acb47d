from ..registry import models  # noqa: F401
from . import transformer  # noqa: F401
from . import embed  # noqa: F401
from . import bottleneck  # noqa: F401
from . import fsq  # noqa: F401
from . import larp_tokenizer  # noqa: F401

from .larp_tokenizer import LARPTokenizer  # noqa: F401
from .bottleneck import Bottleneck, SimpleVectorQuantizer  # noqa: F401
from .fsq import FSQ, LatticeVectorQuantizer  # noqa: F401
