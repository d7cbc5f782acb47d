from ..registry import models  # noqa: F401
from . import transformer  # noqa: F401
from . import embed  # noqa: F401
from . import bottleneck  # noqa: F401
from . import fsq  # noqa: F401
from . import larp_tokenizer  # noqa: F401

from .larp_tokenizer import LARPTokenizer  # noqa: F401
from .bottleneck import Bottleneck, SimpleVectorQuantizer  # noqa: F401
from .fsq import FSQ, LatticeVectorQuantizer  # noqa: F401
from . import larp_ar  # noqa: F401
from . import gptc  # noqa: F401
from . import loss  # noqa: F401
from . import lpips  # noqa: F401

from .larp_ar import LARP_AR, ModelArgs  # noqa: F401
from .gptc import GPTC, GPTCConfig  # noqa: F401
from .loss import VQLPIPSWithDiscriminator, TransformerDiscriminator  # noqa: F401
from .lpips import LPIPS  # noqa: F401
from . import model_new  # noqa: F401
from .model_new import RoPEAutoEncoder, RoPEEncoder, RoPEDecoder  # noqa: F401
from . import model_basic  # noqa: F401
from . import model_stat  # noqa: F401
from . import cosmos  # noqa: F401
from .cosmos import CosmosVideoTokenizer, SimVQ  # noqa: F401
from . import model_titok  # noqa: F401
from .model_titok import TiTok  # noqa: F401
from . import vfm  # noqa: F401
from . import sem  # noqa: F401
from . import model_cnnvit  # noqa: F401
from . import vfm_auto  # noqa: F401
from . import discriminators  # noqa: F401
