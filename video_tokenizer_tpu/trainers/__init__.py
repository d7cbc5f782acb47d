from ..registry import trainers
from . import base_trainer  # noqa: F401
from . import tokenizer_trainer  # noqa: F401

from .base_trainer import BaseTrainer  # noqa: F401
from .tokenizer_trainer import LARPTokenizerTrainer  # noqa: F401
from . import ar_trainer  # noqa: F401
from .ar_trainer import LARPARTrainer, LARPARFramePredictionTrainer  # noqa: F401
from . import tokenizer_trainer_stat  # noqa: F401
